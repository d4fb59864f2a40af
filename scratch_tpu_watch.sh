#!/bin/bash
# Tunnel watcher: probe every ~10 min; on the first HEALTHY probe run the
# round-4 evidence capture (benchmarks/round4_tpu.sh), then keep probing
# so later windows are visible in the log too.
set -u
cd /root/repo
captured=0
while true; do
  echo "=== probe $(date +%H:%M:%S) ===" >> /tmp/tpu_watch.log
  if timeout 590 python /root/repo/scratch_tpu_health.py >> /tmp/tpu_watch.log 2>&1; then
    echo "HEALTHY at $(date +%H:%M:%S)" >> /tmp/tpu_watch.log
    if [ "$captured" -eq 0 ]; then
      captured=1
      touch /tmp/tpu_healthy.marker
      bash benchmarks/round4_tpu.sh >> /tmp/tpu_watch.log 2>&1
      touch /tmp/tpu_capture_done.marker
    fi
    sleep 1800
  else
    echo "unhealthy (rc=$?) at $(date +%H:%M:%S)" >> /tmp/tpu_watch.log
    sleep 300
  fi
done
