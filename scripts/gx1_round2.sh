#!/bin/bash
# Round-2 gate: gx1 (1-degree) distributed factor+solve on the simulated
# 8-device mesh, end to end, with per-round factor checkpointing so the
# run survives session budgets (VERDICT.md next-round item 1).
set -u
cd /root/repo
mkdir -p .bench_cache
if [ ! -f .bench_cache/matrix_gx1.nc ]; then
  python - <<'EOF'
import sys
sys.path.insert(0, '/root/repo')
from bench import build_problem
m, maps = build_problem('gx1', '/root/repo/.bench_cache')
print(f"gx1 matrix ready: flat_len={m.flat_len} nnz={m.nnz}", flush=True)
EOF
fi
export XLA_FLAGS="--xla_force_host_platform_device_count=8 \
  --xla_cpu_collective_timeout_seconds=7200 \
  --xla_cpu_collective_call_warn_stuck_timeout_seconds=3600 \
  --xla_cpu_collective_call_terminate_timeout_seconds=7200"
exec python scripts/gx1_dist_run.py
