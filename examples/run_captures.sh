#!/bin/bash
# Sequenced at-scale capture battery for the axon TPU.
#
# Runs the owed round-3 captures one at a time (the single host core
# serializes dispatch: concurrent runs measure ~16x slow, CLAUDE.md),
# with a tiny-matmul health probe between steps so a wedged tunnel
# stops the battery instead of queueing doomed big compiles behind it
# (PERF.md measurement rule 2).  Timeouts are generous on purpose:
# killing a remote compile leaves the server queue busy for everyone.
#
# Usage:  bash examples/run_captures.sh [logdir]
set -u
cd /root/repo
LOG=${1:-/tmp/captures}
mkdir -p "$LOG"

probe() {
  timeout 900 python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
y = (jnp.ones((128, 128), jnp.float32) @ jnp.ones((128, 128), jnp.float32))
y.block_until_ready()
print("TUNNEL OK %.1f s" % (time.time() - t0))
EOF
}

run_step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name $(date -u +%H:%M:%S) ==="
  if ! probe > "$LOG/probe_$name.log" 2>&1; then
    echo "tunnel unhealthy before $name — stopping battery"
    exit 1
  fi
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "$name rc=$rc  ($(date -u +%H:%M:%S))"
  tail -3 "$LOG/$name.log"
}

# 1. The most-owed number: (32,128) EOM Davidson end-to-end
#    (VERDICT r2 Missing #3).  First compile of the sequential sigma
#    graphs can take tens of minutes; cached reruns are fast.
run_step eom 5400 python examples/eom_at_scale.py --roots 3

# 2. bf16-vs-f32 DF residual gap at the north-star scale (VERDICT r2
#    Weak #6).
run_step bf16gap 3600 python examples/bf16_gap_probe.py

# 3. Response solve_right at scale (VERDICT r2 Weak #3 capture).
run_step response 5400 python examples/response_at_scale.py

# 4. RT-df RHS wall at scale.
run_step rtdf 3600 python examples/rt_df_at_scale.py

# 5. The bench itself (warms BENCH_r03's cache).
run_step bench 5400 python bench.py

# 6. Real-molecule rows: uracil/aug-cc-pVDZ (220 bf, the reference's own
#    flagship molecule) — DF-CCSD solve, then the (T) scan, then CC3
#    from factors (beyond the reference: its CC3 needs the dense ERI).
if [ -f df_cache/uracil_aug.npz ]; then
  run_step uracil_ccsd_t 5400 python examples/run_df_molecule.py \
    df_cache/uracil_aug.npz --precision SP --e-conv 1e-7 --r-conv 1e-6 \
    --triples --post
  run_step uracil_cc3 7200 python examples/run_df_molecule.py \
    df_cache/uracil_aug.npz --model CC3 --precision SP \
    --e-conv 1e-6 --r-conv 1e-5 --maxiter 40
fi

# 7. (H2O)_12 (492 bf) DF-CCSD — the biggest real-molecule row; shallow
#    DIIS ring to fit the 16 GB HBM at (48,432) (PERF.md residency
#    playbook).
if [ -f df_cache/w12aug.npz ]; then
  run_step w12_ccsd 7200 python examples/run_df_molecule.py \
    df_cache/w12aug.npz --precision SP --e-conv 1e-6 --r-conv 1e-5 \
    --max-diis 1 --nblocks 64
fi

echo "battery complete; logs in $LOG"
