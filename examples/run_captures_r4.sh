#!/bin/bash
# Round-4 capture battery: the VERDICT r3 "do this" items that need TPU
# wall-clock —
#   w10_mixed        (H2O)_10 410-bf DF-CCSD via solve_cc_mixed: f32 to
#                    the noise floor, f64 refinement to 1e-7 Eh (the
#                    north-star accuracy half; VERDICT #1)
#   uracil_cc3_post  uracil/aug-cc-pVDZ CC3 + Lambda-CC3 + one-pdm +
#                    dipole over factors, end-to-end (VERDICT #2a)
#   w14_ccsd         (H2O)_14 574-bf DF-CCSD — the ~600-bf real molecule
#                    the north star names (VERDICT #2b)
# Steps 2/3 skip themselves when their factor .npz has not been prepared
# (examples/prepare_df_molecule.py runs host-side for hours).
set -u
cd /root/repo
LOG=${1:-/tmp/captures_r4}
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

# max_diis MUST be 0 at (40,360): a depth-4 f32 DIIS ring is 6.6 GB of
# o^2v^2 pairs and the one-program f32 step then needs 17.9/15.75 GB
# (measured compile-OOM).  The f64 stage auto-splits + runs ring-free.
run_step w10_mixed 10800 python examples/run_df_molecule.py \
  df_cache/w10aug.npz --mixed --e-conv 1e-7 --r-conv 1e-6 \
  --sp-conv 1e-6 --refine-maxiter 15 --max-diis 0 --maxiter 80

if [ -f df_cache/uracil_aug.npz ]; then
  run_step uracil_cc3_post 14400 python examples/run_df_molecule.py \
    df_cache/uracil_aug.npz --model CC3 --precision SP --e-conv 1e-6 \
    --r-conv 1e-5 --maxiter 25 --post
else
  echo "skip uracil_cc3_post: df_cache/uracil_aug.npz not prepared"
fi

if [ -f df_cache/w14aug.npz ]; then
  run_step w14_ccsd 14400 python examples/run_df_molecule.py \
    df_cache/w14aug.npz --precision SP --e-conv 1e-6 --r-conv 1e-5 \
    --max-diis 0 --nblocks 252 --maxiter 60
else
  echo "skip w14_ccsd: df_cache/w14aug.npz not prepared"
fi

echo "battery r4 complete $(date -u +%H:%M:%S); logs in $LOG"
