#!/bin/bash
# Retry the TPU tunnel until healthy, then run the round-5 sections.
# Hang-hardened (round-5 lesson): the standalone probe can pass while the
# NEXT process's first compile wedges forever — so each session attempt
# starts with a BOUNDED health-only session run (timeout 20 min); only when
# that lands do we commit to the long measurement run. One attempt per
# ~20 min keeps client churn low.
# Log: /tmp/tpu_watchdog_r5.log
LOG=/tmp/tpu_watchdog_r5.log
cd /root/repo
SECTIONS="${@:-infercheck nmscheck stemremat topk_ab trainbest traincombo i8min inferprof128 trainprof24r}"
for attempt in $(seq 1 30); do
  echo "$(date +%H:%M:%S) gate attempt $attempt" >> "$LOG"
  if timeout 1200 python scripts/tpu_r5_session.py health >> "$LOG" 2>&1; then
    echo "$(date +%H:%M:%S) health landed - running: $SECTIONS" >> "$LOG"
    timeout 14400 python scripts/tpu_r5_session.py $SECTIONS >> "$LOG" 2>&1
    echo "$(date +%H:%M:%S) session done rc=$?" >> "$LOG"
    exit 0
  fi
  echo "$(date +%H:%M:%S) health attempt timed out; sleeping 20m" >> "$LOG"
  sleep 1200
done
echo "$(date +%H:%M:%S) gave up after 30 attempts" >> "$LOG"
exit 1
