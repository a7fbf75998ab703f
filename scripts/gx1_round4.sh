#!/bin/bash
# Round-4 gate runner: gx1 (1-degree, 320x384x60) FLOAT64 production run,
# end to end, crash-proof (VERDICT.md round-3 items 1 and weak-5).
#
# Unlike scripts/gx1_round3.sh (run-once, exit-on-death), this runner:
#   * adopts an already-running factor pass (GX1_ADOPT_PID) and waits,
#   * re-launches scripts/chip_factor_only.py until it exits 0, with
#     bounded retries and a logged post-mortem per death (the factor
#     pass itself resumes from per-round checkpoints in
#     .bench_cache/fckpt_gx1, solver/checkpoint.py::scan),
#   * then runs the out-of-core stream solve with >=4 RHS and records
#     a machine-readable artifact (.bench_cache/gx1_result.json).
#
# Reference equivalent: 144-rank SuperLU_DIST factor+solve of the same
# problem (test/test_solve_ABglobal.csh:6-7,31-32).
set -u
cd /root/repo
mkdir -p .bench_cache
LOG=.bench_cache/gx1_round4.log
log() { echo "[gx1r4 $(date +%H:%M:%S)] $*" >> "$LOG"; echo "[gx1r4 $(date +%H:%M:%S)] $*"; }

if [ ! -f .bench_cache/matrix_gx1.nc ]; then
  log "building gx1 matrix"
  python - <<'EOF' || { log "matrix build FAILED"; exit 1; }
import sys
sys.path.insert(0, '/root/repo')
from bench import build_problem
m, maps = build_problem('gx1', '/root/repo/.bench_cache')
print(f"gx1 matrix ready: flat_len={m.flat_len} nnz={m.nnz}", flush=True)
EOF
fi

# Adopt a factor pass that is already running (started outside this
# script): wait for it rather than racing it on the same checkpoint dir.
if [ -n "${GX1_ADOPT_PID:-}" ] && kill -0 "$GX1_ADOPT_PID" 2>/dev/null; then
  log "adopting running factor pass pid=$GX1_ADOPT_PID; waiting for it"
  while kill -0 "$GX1_ADOPT_PID" 2>/dev/null; do sleep 60; done
  log "adopted factor pass exited"
fi

MAX_RETRIES=${GX1_MAX_RETRIES:-30}
try=0
while :; do
  n=$(ls .bench_cache/fckpt_gx1/round_*.npz 2>/dev/null | wc -l)
  # resume guard: a restart must resume at least (rounds-on-disk - 2)
  # validated rounds, else the plan/hash no longer matches the prior run
  min=$((n - 2)); [ "$min" -lt 0 ] && min=0
  log "factor attempt $try (round files on disk: $n, min_resume=$min)"
  NK_RUN_CPU=1 NK_RUN_PREC=f64 NK_RUN_SIZE=gx1 NK_MIN_RESUME=$min \
    NK_EA_WAVES=0 \
    python scripts/chip_factor_only.py >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then log "factor pass COMPLETE"; break; fi
  try=$((try + 1))
  log "factor pass DIED rc=$rc (attempt $try/$MAX_RETRIES); post-mortem tail:"
  tail -5 "$LOG" | sed 's/^/[gx1r4]   /'
  if [ "$try" -ge "$MAX_RETRIES" ]; then log "giving up after $try deaths"; exit 1; fi
  sleep 15
done

log "stream solve (out-of-core over round checkpoints, 4 RHS)"
NK_RUN_SIZE=gx1 NK_NRHS=4 python scripts/gx1_stream_solve.py >> "$LOG" 2>&1
rc=$?
log "stream solve rc=$rc (result artifact: .bench_cache/gx1_result.json)"
tail -3 "$LOG"
exit $rc
