#!/bin/bash
# Round-3 gate: gx1 (1-degree, 320x384x60) FLOAT64 production run,
# end to end (VERDICT.md round-2 item 1 + the round-3 precision finding:
# fp32 factors are not a preconditioner at this growth class).
#
# Pipeline on this single-core host:
#   1. build the gx1 matrix (cached, deterministic seed 7)
#   2. host-CPU float64 factor pass with per-round trimmed checkpoints
#      (resumable; ~88 GB on disk) and factor offload (RSS stays bounded)
#   3. out-of-core stream solve: forward+backward walk over the round
#      files, one round resident at a time, exact f64 refinement
#
# Reference equivalent: 144-rank SuperLU_DIST factor+solve of the same
# problem class (test/test_solve_ABglobal.csh:6-7,31-32).
set -u
cd /root/repo
mkdir -p .bench_cache
log() { echo "[gx1r3 $(date +%H:%M:%S)] $*"; }

if [ ! -f .bench_cache/matrix_gx1.nc ]; then
  log "building gx1 matrix"
  python - <<'EOF'
import sys
sys.path.insert(0, '/root/repo')
from bench import build_problem
m, maps = build_problem('gx1', '/root/repo/.bench_cache')
print(f"gx1 matrix ready: flat_len={m.flat_len} nnz={m.nnz}", flush=True)
EOF
  [ $? -eq 0 ] || { log "matrix build FAILED"; exit 1; }
fi

log "factor pass (host CPU, float64, checkpointed)"
NK_RUN_CPU=1 NK_RUN_PREC=f64 NK_RUN_SIZE=gx1 \
  python scripts/chip_factor_only.py || { log "factor pass FAILED"; exit 1; }

log "stream solve (out-of-core over round checkpoints)"
NK_RUN_SIZE=gx1 python scripts/gx1_stream_solve.py
rc=$?
log "stream solve rc=$rc"
exit $rc
