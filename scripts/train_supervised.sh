#!/bin/bash
# Stall-resilient training driver for the axon-tunneled dev TPU: the tunnel
# has been observed to wedge after ~45 min of continuous stepping, freezing
# the client mid-iteration.  This supervisor runs training in bounded chunks
# and resumes from the latest orbax checkpoint (deterministic TrainState
# resume) whenever a chunk exits or stalls (no event-file growth for
# STALL_SECS).  On a healthy TPU pod none of this is needed — it is a
# dev-box harness, equivalent in spirit to the preemption-recovery flow
# (SIGTERM -> checkpoint -> -r).
#
#   scripts/train_supervised.sh <log_root> <envs> <target_iter> [chunk=500] [seed=1] [robot=nightmare_v3] [extra train.py args...]

set -u
LOG_ROOT=${1:?log_root}
ENVS=${2:?envs}
TARGET=${3:?target_iter}
CHUNK=${4:-500}
SEED=${5:-1}
ROBOT=${6:-nightmare_v3}
shift $(( $# < 6 ? $# : 6 ))
EXTRA=("$@")   # passed verbatim to train.py (e.g. --std_floor 0.15)

# exactly one supervisor per box: two supervisors' liveness probes can keep a
# wedged tunnel wedged forever (docs/BENCH_NOTES.md).  flock enforces what
# used to be operator memory.
LOCK=/tmp/nightmare_train_supervisor.lock
exec 9>"$LOCK"
if ! flock -n 9; then
  echo "supervisor: another supervisor holds $LOCK — refusing to start" >&2
  exit 1
fi
# stall threshold once metrics are flowing; the FIRST growth gets a longer
# grace because a cold compile can exceed 5 min (anymal_c Newton at 2048
# envs) and killing a healthy compile loops the supervisor forever
STALL_SECS=300
FIRST_GRACE=1200

latest_iter() {
  ls "$LOG_ROOT"/*/model_* 2>/dev/null -d | sed 's/.*model_//' | sort -n | tail -1
}

evfile() {
  ls -t "$LOG_ROOT"/*/events.out.tfevents.* 2>/dev/null | head -1
}

wait_tpu() {
  # after a stall-kill the tunnel stays poisoned until every client is gone
  # and it has quiesced (~90 s observed); relaunching into a wedged tunnel
  # just hangs the next chunk in restore/compile.  Probe with a tiny op
  # until the chip answers.
  sleep 60
  for i in $(seq 1 20); do
    if timeout 45 python -c "import jax, jax.numpy as jnp; print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))" >/dev/null 2>&1; then
      echo "supervisor: TPU responsive again (probe $i)"
      return 0
    fi
    echo "supervisor: TPU still wedged (probe $i), waiting"
    sleep 30
  done
  echo "supervisor: TPU never came back after 20 probes; launching anyway"
}

while true; do
  cur=$(latest_iter); cur=${cur:-0}
  if [ "$cur" -ge "$TARGET" ]; then
    echo "supervisor: reached iter $cur >= $TARGET, done"
    break
  fi
  todo=$(( TARGET - cur )); [ "$todo" -gt "$CHUNK" ] && todo=$CHUNK
  if [ "$cur" -gt 0 ]; then
    RESUME=(-r -p "$LOG_ROOT")
  else
    RESUME=()
  fi
  echo "supervisor: at iter $cur, launching chunk of $todo"
  python -u -m nightmare_rl_tpu.tools.train -e "$ENVS" -n "$todo" \
    --seed "$SEED" --robot "$ROBOT" "${RESUME[@]}" --log_root "$LOG_ROOT" \
    ${EXTRA[@]+"${EXTRA[@]}"} &
  PID=$!
  # watch for stalls: kill the chunk if the newest event file stops growing
  last_size=0; last_change=$(date +%s); grew=0
  while kill -0 "$PID" 2>/dev/null; do
    sleep 30
    ev=$(evfile)
    size=$(stat -c %s "$ev" 2>/dev/null || echo 0)
    now=$(date +%s)
    limit=$STALL_SECS; [ "$grew" -eq 0 ] && limit=$FIRST_GRACE
    if [ "$size" != "$last_size" ]; then
      [ "$last_size" -gt 0 ] && grew=1
      last_size=$size; last_change=$now
    elif [ $(( now - last_change )) -gt "$limit" ]; then
      echo "supervisor: stall detected ($(( now - last_change ))s no progress, grew=$grew), killing $PID"
      kill "$PID"; sleep 15; kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  wait "$PID" 2>/dev/null
  wait_tpu
done
