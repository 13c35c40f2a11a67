#!/bin/bash
# Serial TPU job queue (CLAUDE.md "TPU job queue").
#
# The tunnel allows STRICTLY ONE TPU client at a time; this spool runner
# serializes device jobs.  Install + start:
#
#     mkdir -p /tmp/tpu_queue/{jobs,done,failed,logs}
#     cp tools/tpu_queue_runner.sh /tmp/tpu_queue/runner.sh
#     nohup bash /tmp/tpu_queue/runner.sh > /tmp/tpu_queue/runner.out 2>&1 &
#
# Enqueue by writing numbered job files: /tmp/tpu_queue/jobs/NN_name.sh
# (executed with bash, in lexical order; each job sets its own `timeout`).
# Logs land in /tmp/tpu_queue/logs/<job>.log; finished jobs move to
# done/ (rc==0) or failed/ (rc!=0).  State lines append to queue.log.
#
# The runner probes the relay (port 8082) before each job: when the
# relay is down it waits instead of launching a client that would block
# forever in backend init.  It never kills by pattern; jobs own their
# timeouts.

Q=/tmp/tpu_queue
mkdir -p "$Q"/jobs "$Q"/done "$Q"/failed "$Q"/logs

state() { echo "[$(date +%H:%M:%S)] $*" >> "$Q/queue.log"; }

relay_up() {
  python3 - <<'EOF'
import socket, sys
try:
    socket.create_connection(("127.0.0.1", 8082), 2).close()
except OSError:
    sys.exit(1)
EOF
}

state "runner started (pid $$)"
while true; do
  job=$(ls "$Q"/jobs/*.sh 2>/dev/null | sort | head -1)
  if [ -z "$job" ]; then
    sleep 10
    continue
  fi
  if ! relay_up; then
    state "relay down — holding $(basename "$job")"
    sleep 60
    continue
  fi
  name=$(basename "$job" .sh)
  state "start $name"
  bash "$job" > "$Q/logs/$name.log" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then
    mv "$job" "$Q/done/"
    state "done $name (rc=0)"
  else
    mv "$job" "$Q/failed/"
    state "FAILED $name (rc=$rc)"
  fi
done
