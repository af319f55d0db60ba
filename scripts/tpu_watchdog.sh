#!/bin/bash
# Retry the TPU tunnel until healthy, then run the staged round-3 sections.
# One probe per ~20 min (short-lived TPU clients wedge the tunnel; keep churn low).
# Log: /tmp/tpu_watchdog.log  Sections: $@ (default: the staged unmeasured set).
SECTIONS="${@:-health opt5 l0fine i8 u8in trainopt abf16 l0train trainprof24 segpose cls}"
LOG=/tmp/tpu_watchdog.log
cd /root/repo
for attempt in $(seq 1 30); do
  echo "$(date +%H:%M:%S) probe $attempt" >> "$LOG"
  if timeout 300 python scripts/tpu_health.py >> "$LOG" 2>&1; then
    echo "$(date +%H:%M:%S) tunnel healthy - running: $SECTIONS" >> "$LOG"
    timeout 7200 python scripts/tpu_r3_session.py $SECTIONS >> "$LOG" 2>&1
    echo "$(date +%H:%M:%S) session done rc=$?" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe failed; sleeping 20m" >> "$LOG"
  sleep 1200
done
echo "$(date +%H:%M:%S) gave up after 30 probes" >> "$LOG"
exit 1
