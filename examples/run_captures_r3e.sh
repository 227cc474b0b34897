#!/bin/bash
# Round-3 battery E: retries after the split-residual hardening.
#   w12_ccsd       nblocks 216 (ladder W 0.65 GB) + the slice-based ladder
#   bf16gap512     f32 side through the hardened split programs
#   rtdf384        RT RHS at (32,384): the (32,512) fused RT RHS and the
#                  Lambda split programs exceed HBM; 384 is the capture
#   uracil_cc3_post  Lambda-CC3 retry with the chunked t3-side row
set -u
cd /root/repo
LOG=${1:-/tmp/captures_e}
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
    echo "tunnel unhealthy before $name — stopping"
    exit 1
  fi
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  echo "$name rc=$?  ($(date -u +%H:%M:%S))"
  tail -3 "$LOG/$name.log"
}

run_step w12_ccsd 10800 python examples/run_df_molecule.py \
  df_cache/w12aug.npz --precision SP --e-conv 1e-6 --r-conv 1e-5 \
  --max-diis 0 --nblocks 216 --maxiter 80

run_step bf16gap512 5400 python examples/bf16_gap_probe.py

run_step rtdf384 5400 python examples/rt_df_at_scale.py \
  --nv 384 --naux 1280 --cc-iters 0

run_step uracil_cc3_post 10800 python examples/run_df_molecule.py \
  df_cache/uracil_aug.npz --model CC3 --precision SP --e-conv 1e-6 \
  --r-conv 1e-5 --maxiter 8 --post

echo "battery E complete $(date -u +%H:%M:%S); logs in $LOG"
