#!/bin/bash
# Round-3 battery D: the captures unlocked by the split DF-CCSD residual.
#   w12_ccsd     (H2O)_12/aug-cc-pVDZ 492 bf, SP, split programs + lean
#                no-DIIS update (the fused step measured 21.6 G / 15.75 G)
#   bf16gap512   bf16-vs-f32 residual gap at the TRUE north-star (32,512)
#                (f32 side through the split programs)
#   rtdf         RT RHS at (32,512) from factors, one-pdm-only density
set -u
cd /root/repo
LOG=${1:-/tmp/captures_d}
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

run_step() {  # run_step <name> <timeout> cmd...
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
  --max-diis 0 --nblocks 108 --maxiter 80

run_step bf16gap512 5400 python examples/bf16_gap_probe.py

run_step rtdf 5400 python examples/rt_df_at_scale.py --cc-iters 0

echo "battery D complete $(date -u +%H:%M:%S); logs in $LOG"
