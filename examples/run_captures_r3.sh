#!/bin/bash
# Round-3 continuation battery: owed at-scale captures + factor-archive
# regeneration (the workspace reset wiped the gitignored df_cache/).
#
# Strictly serial: the single host core serializes axon dispatch, so a
# CPU prep concurrent with a TPU capture measures ~16x slow (CLAUDE.md).
# CPU preps are interleaved between TPU steps in priority order:
#   1. eom        (TPU)  most-owed number; compile cache is warm
#   2. prep w10   (CPU)  bench.py's real-molecule row needs it
#   3. prep uracil(CPU)
#   4. bench      (TPU)  warms the driver's end-of-round cache
#   5. bf16gap    (TPU)
#   6. response   (TPU)
#   7. rtdf       (TPU)
#   8. uracil CCSD(T) + post   (TPU)
#   9. uracil CC3              (TPU)
#  10. prep w12   (CPU)
#  11. w12 CCSD   (TPU)
#
# Touch $LOG/SKIP_<name> to skip a step (dynamic reprioritisation).
# Tiny-matmul probe before each TPU step: a wedged tunnel stops the
# battery instead of queueing doomed compiles behind it.
set -u
cd /root/repo
LOG=${1:-/tmp/captures}
mkdir -p "$LOG" df_cache

probe() {
  timeout 900 python - <<'EOF'
import time, jax, jax.numpy as jnp
t0 = time.time()
y = (jnp.ones((128, 128), jnp.float32) @ jnp.ones((128, 128), jnp.float32))
y.block_until_ready()
print("TUNNEL OK %.1f s" % (time.time() - t0))
EOF
}

run_step() {  # run_step <name> <tpu|cpu> <timeout> cmd...
  name=$1; kind=$2; tmo=$3; shift 3
  if [ -f "$LOG/SKIP_$name" ]; then
    echo "=== $name SKIPPED (flag) ==="; return 0
  fi
  echo "=== $name $(date -u +%H:%M:%S) ==="
  if [ "$kind" = tpu ]; then
    if ! probe > "$LOG/probe_$name.log" 2>&1; then
      echo "tunnel unhealthy before $name — stopping battery"
      exit 1
    fi
  fi
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "$name rc=$rc  ($(date -u +%H:%M:%S))"
  tail -3 "$LOG/$name.log"
}

run_step eom tpu 5400 python examples/eom_at_scale.py --roots 3

run_step prep_w10 cpu 9000 python examples/prepare_df_molecule.py \
  --waters 10 --basis aug-cc-pvdz --df-tol 1e-6 --out df_cache/w10aug.npz
run_step prep_uracil cpu 7200 python examples/prepare_df_molecule.py \
  --mol uracil --basis aug-cc-pvdz --df-tol 1e-6 --out df_cache/uracil_aug.npz

run_step bench tpu 7200 python bench.py

run_step bf16gap tpu 3600 python examples/bf16_gap_probe.py
run_step response tpu 5400 python examples/response_at_scale.py
run_step rtdf tpu 3600 python examples/rt_df_at_scale.py

if [ -f df_cache/uracil_aug.npz ]; then
  run_step uracil_ccsd_t tpu 5400 python examples/run_df_molecule.py \
    df_cache/uracil_aug.npz --precision SP --e-conv 1e-7 --r-conv 1e-6 \
    --triples --post
  run_step uracil_cc3 tpu 7200 python examples/run_df_molecule.py \
    df_cache/uracil_aug.npz --model CC3 --precision SP \
    --e-conv 1e-6 --r-conv 1e-5 --maxiter 40
fi

run_step prep_w12 cpu 14400 python examples/prepare_df_molecule.py \
  --waters 12 --basis aug-cc-pvdz --df-tol 1e-6 --out df_cache/w12aug.npz

if [ -f df_cache/w12aug.npz ]; then
  run_step w12_ccsd tpu 7200 python examples/run_df_molecule.py \
    df_cache/w12aug.npz --precision SP --e-conv 1e-6 --r-conv 1e-5 \
    --max-diis 1 --nblocks 64
fi

echo "battery complete $(date -u +%H:%M:%S); logs in $LOG"
