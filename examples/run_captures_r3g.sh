#!/bin/bash
# Round-3 battery G: w12 after the ring_je three-way split; uracil
# Lambda-CC3 post after the chunked t3- AND l3-side rows.
set -u
cd /root/repo
LOG=${1:-/tmp/captures_g}
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

run_step uracil_cc3_post 10800 python examples/run_df_molecule.py \
  df_cache/uracil_aug.npz --model CC3 --precision SP --e-conv 1e-6 \
  --r-conv 1e-5 --maxiter 8 --post

echo "battery G complete $(date -u +%H:%M:%S); logs in $LOG"
