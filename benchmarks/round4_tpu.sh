#!/bin/bash
# Round-4 TPU evidence capture: run at the FIRST healthy tunnel window.
# Each stage is independently time-bounded and logs to temp_results/ so a
# mid-sequence stall keeps everything already captured.
set -u
cd /root/repo
mkdir -p temp_results
stamp=$(date +%Y%m%d_%H%M%S)
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "temp_results/r4_tpu_${stamp}.log"; }

log "HEAD: $(git rev-parse --short HEAD 2>/dev/null)"
log "=== stage 1: smoke (29 cases incl. volterra fused) ==="
timeout 3600 python benchmarks/smoke_tpu.py 2>&1 | tail -45 | tee -a "temp_results/r4_smoke_${stamp}.log"
log "smoke rc=$?"

log "=== stage 2: packed ensemble A/B (16x heat) + bench ==="
timeout 2700 python bench.py 2>&1 | tee -a "temp_results/r4_bench_${stamp}.log" | tail -3
log "bench rc=$?"

log "=== done ==="
