#!/bin/bash
# Retry the TPU tunnel until healthy, then run the round-5 sections.
# One probe per ~20 min (short-lived TPU clients wedge the tunnel; keep churn low).
# Log: /tmp/tpu_watchdog_r5.log
LOG=/tmp/tpu_watchdog_r5.log
cd /root/repo
for attempt in $(seq 1 30); do
  echo "$(date +%H:%M:%S) probe $attempt" >> "$LOG"
  if timeout 300 python scripts/tpu_health.py >> "$LOG" 2>&1; then
    SECTIONS="${@:-health infercheck nmscheck stemremat topk_ab trainbest traincombo i8min inferprof128 trainprof24r}"
    echo "$(date +%H:%M:%S) tunnel healthy - running: $SECTIONS" >> "$LOG"
    timeout 14400 python scripts/tpu_r5_session.py $SECTIONS >> "$LOG" 2>&1
    echo "$(date +%H:%M:%S) session done rc=$?" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe failed; sleeping 20m" >> "$LOG"
  sleep 1200
done
echo "$(date +%H:%M:%S) gave up after 30 probes" >> "$LOG"
exit 1
