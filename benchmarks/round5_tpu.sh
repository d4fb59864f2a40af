#!/bin/bash
# Round-5 TPU evidence capture. Differences from round 4 (VERDICT r4 #2):
# the durable artifacts land at TRACKED paths —
#   benchmarks/results/r05.json       full bench record (all extras)
#   benchmarks/results/smoke_r05.txt  smoke summary (31 cases)
# — so the round's numbers survive at HEAD and a pytest run cannot clobber
# them (tests write bench_full_cpu.json / bench_last.cpu.json only).
set -u
cd /root/repo
mkdir -p temp_results benchmarks/results
stamp=$(date +%Y%m%d_%H%M%S)
log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "temp_results/r5_tpu_${stamp}.log"; }

log "HEAD: $(git rev-parse --short HEAD 2>/dev/null)"
log "=== stage 1: smoke (31 cases incl. uat/inverse_heat fused) ==="
timeout 3600 python benchmarks/smoke_tpu.py 2>&1 | grep -v WARNING \
  | tee "temp_results/r5_smoke_${stamp}.log" | tail -40
rc=$?
log "smoke rc=${rc}"
{ echo "# smoke_tpu @ HEAD $(git rev-parse --short HEAD) ${stamp} rc=${rc}";
  grep -E "^(OK|FAIL|SMOKE)" "temp_results/r5_smoke_${stamp}.log"; } \
  > benchmarks/results/smoke_r05.txt

log "=== stage 2: bench (headline + extras; line-capped capture) ==="
timeout 2700 python bench.py 2>&1 | tee -a "temp_results/r5_bench_${stamp}.log" | tail -2
log "bench rc=$?"
cp benchmarks/results/bench_full_tpu.json benchmarks/results/r05.json
log "tracked record: benchmarks/results/r05.json ($(wc -c < benchmarks/results/r05.json) bytes)"

log "=== done — git add benchmarks/results/{r05.json,smoke_r05.txt} ==="
