#!/bin/bash
# Retry the TPU tunnel until healthy, then run the staged round-3 sections.
# One probe per ~20 min (short-lived TPU clients wedge the tunnel; keep churn low).
# Log: /tmp/tpu_watchdog.log
# Sections: $@ if given, else scripts/staged_sections.txt AT RUN TIME (so new
# sections can be staged without restarting the watchdog).
LOG=/tmp/tpu_watchdog.log
cd /root/repo
for attempt in $(seq 1 30); do
  echo "$(date +%H:%M:%S) probe $attempt" >> "$LOG"
  if timeout 300 python scripts/tpu_health.py >> "$LOG" 2>&1; then
    SECTIONS="${@:-$(cat scripts/staged_sections.txt 2>/dev/null)}"
    echo "$(date +%H:%M:%S) tunnel healthy - running: $SECTIONS" >> "$LOG"
    timeout 10800 python scripts/tpu_r3_session.py $SECTIONS >> "$LOG" 2>&1
    echo "$(date +%H:%M:%S) session done rc=$?" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) probe failed; sleeping 20m" >> "$LOG"
  sleep 1200
done
echo "$(date +%H:%M:%S) gave up after 30 probes" >> "$LOG"
exit 1
