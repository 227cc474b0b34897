#!/bin/bash
# Round-3 retry battery: the six captures that failed in run_captures_r3.sh,
# after the fixes in commit "Fix the six at-scale capture failures".
#
#   bf16gap       nblocks 128 (f32 pass was 17.7G > 15.75G HBM)
#   response      host-side pseudoresponse + noise-floor stall detection
#   rtdf          max_diis=0 prep solves (depth-8 ring was the runtime OOM)
#   uracil_ccsd_t chunked (T) auto-selected at no*v^3 > 2^27
#   uracil_cc3    chunked CC3 rows (unchunked compile-OOM'd at 27.7G)
#   w12_ccsd      --max-diis 0 --nblocks 108 + the Woooo copy fix
#   bench         last: re-warm the driver's end-of-round compile cache
#                 (the Woooo operand swap changed the DF step graph)
#
# Strictly serial (single host core serializes axon dispatch; concurrent
# TPU jobs crash the remote worker).  Tiny-matmul probe before each TPU
# step; touch $LOG/SKIP_<name> to skip a step.
set -u
cd /root/repo
LOG=${1:-/tmp/captures_b}
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
  if [ -f "$LOG/SKIP_$name" ]; then
    echo "=== $name SKIPPED (flag) ==="; return 0
  fi
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

run_step bf16gap 3600 python examples/bf16_gap_probe.py
run_step response 5400 python examples/response_at_scale.py
run_step rtdf 3600 python examples/rt_df_at_scale.py

run_step uracil_ccsd_t 9000 python examples/run_df_molecule.py \
  df_cache/uracil_aug.npz --precision SP --e-conv 1e-7 --r-conv 1e-6 \
  --triples --post

run_step uracil_cc3 10800 python examples/run_df_molecule.py \
  df_cache/uracil_aug.npz --model CC3 --precision SP \
  --e-conv 1e-6 --r-conv 1e-5 --maxiter 40

run_step w12_ccsd 9000 python examples/run_df_molecule.py \
  df_cache/w12aug.npz --precision SP --e-conv 1e-6 --r-conv 1e-5 \
  --max-diis 0 --nblocks 108

run_step bench 7200 python bench.py

echo "battery complete $(date -u +%H:%M:%S); logs in $LOG"
