#!/bin/bash
# Unattended axon-recovery retry loop (outage pattern, docs/R3_SESSION_NOTES.md):
# one TPU client at a time, each attempt fails cleanly on its own (~25-30 min
# UNAVAILABLE during the outage), 5-min gaps. Stops as soon as an attempt
# produces probe output. Detached via setsid so it survives driver restarts;
# check /tmp/retry_loop.pid + this log before starting ANY other TPU client.
n=${1:-5}
echo "[$(date +%H:%M:%S)] retry loop up (start attempt $n, pid $$)" >> /tmp/retry_loop.log
while true; do
  echo "[$(date +%H:%M:%S)] attempt $n starting" >> /tmp/retry_loop.log
  python /root/repo/scripts/session_r3jk.py \
    > /tmp/session_jk_try$n.out 2> /tmp/session_jk_try$n.err
  rc=$?
  echo "[$(date +%H:%M:%S)] attempt $n exited rc=$rc" >> /tmp/retry_loop.log
  if [ -s /tmp/session_jk_try$n.out ]; then
    echo "[$(date +%H:%M:%S)] attempt $n produced output; loop done" >> /tmp/retry_loop.log
    break
  fi
  n=$((n+1))
  sleep 300
done
rm -f /tmp/retry_loop.pid
