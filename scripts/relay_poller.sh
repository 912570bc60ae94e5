#!/usr/bin/env bash
# Poll the axon relay with a cheap bounded probe; the moment it answers,
# launch the staged measurement session (scripts/tpu_session.sh) and exit.
# Designed for an unattended background launch during a relay outage:
#   bash scripts/relay_poller.sh & echo $! > /tmp/relay_poller.pid
#   tail -f /tmp/relay_poller.log /tmp/tpu_session.log
set -u
cd "$(dirname "$0")/.."
LOG=${POLLER_LOG:-/tmp/relay_poller.log}
DEADLINE=$(( $(date +%s) + ${POLL_HOURS:-11} * 3600 ))
echo "[poller] start $(date +%H:%M:%S)" >>"$LOG"
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  if timeout 90 python - <<'EOF' >>"$LOG" 2>&1
import jax, time
t0 = time.time()
v = float((jax.numpy.ones((128, 128)) @ jax.numpy.ones((128, 128))).sum())
print(f"[poller] probe ok v={v} dt={time.time()-t0:.1f}s backend={jax.default_backend()}")
EOF
  then
    echo "[poller] relay UP at $(date +%H:%M:%S) — launching tpu_session.sh" >>"$LOG"
    bash scripts/tpu_session.sh
    echo "[poller] tpu_session.sh finished at $(date +%H:%M:%S)" >>"$LOG"
    exit 0
  fi
  echo "[poller] relay still down at $(date +%H:%M:%S)" >>"$LOG"
  sleep 115
done
echo "[poller] deadline reached without relay" >>"$LOG"
exit 1
