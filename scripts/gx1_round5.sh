#!/bin/bash
# Round-5 gate runner: gx1 (1-degree, 320x384x60) FLOAT64 production run,
# end to end, crash-proof (same structure as scripts/gx1_round4.sh).
#
# Round-5 changes vs round 4:
#   * the stream solve targets the 1e-10 residual CONTRACT (round 4's
#     1e-11 target burned ~1,500 s of disk walking past the measured
#     ~5e-11 plateau — VERDICT round-4 item 5),
#   * the factor pass no longer pins NK_EA_WAVES=0: the wave gate only
#     affects f64-on-TPU, and this pass runs on the host CPU
#     (live Schur peaks at 38.3 GB mid-tree, solver/memplan.py, vs the
#     chip's 16 GB HBM); tree-top chip handoff uses the same checkpoint
#     dir via NK_FACTOR_STOP_AFTER (scripts/chip_factor_only.py).
#
# Reference equivalent: 144-rank SuperLU_DIST factor+solve of the same
# problem (test/test_solve_ABglobal.csh:6-7,31-32).
set -u
cd /root/repo
mkdir -p .bench_cache
LOG=.bench_cache/gx1_round5.log
log() { echo "[gx1r5 $(date +%H:%M:%S)] $*" >> "$LOG"; echo "[gx1r5 $(date +%H:%M:%S)] $*"; }

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

MAX_RETRIES=${GX1_MAX_RETRIES:-30}
try=0
while :; do
  n=$(ls .bench_cache/fckpt_gx1/round_*.npz 2>/dev/null | wc -l)
  # resume guard: a restart must resume at least (rounds-on-disk - 2)
  # validated rounds, else the plan/hash no longer matches the prior run
  min=$((n - 2)); [ "$min" -lt 0 ] && min=0
  log "factor attempt $try (round files on disk: $n, min_resume=$min)"
  NK_RUN_CPU=1 NK_RUN_PREC=f64 NK_RUN_SIZE=gx1 NK_MIN_RESUME=$min \
    python scripts/chip_factor_only.py >> "$LOG" 2>&1
  rc=$?
  if [ $rc -eq 0 ]; then log "factor pass COMPLETE"; break; fi
  try=$((try + 1))
  log "factor pass DIED rc=$rc (attempt $try/$MAX_RETRIES); post-mortem tail:"
  tail -5 "$LOG" | sed 's/^/[gx1r5]   /'
  if [ "$try" -ge "$MAX_RETRIES" ]; then log "giving up after $try deaths"; exit 1; fi
  sleep 15
done

log "stream solve (out-of-core over round checkpoints, 4 RHS, tol=contract)"
NK_RUN_SIZE=gx1 NK_NRHS=4 python scripts/gx1_stream_solve.py >> "$LOG" 2>&1
rc=$?
log "stream solve rc=$rc (result artifact: .bench_cache/gx1_result.json)"
tail -3 "$LOG"
exit $rc
