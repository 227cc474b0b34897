#!/bin/bash
# Round-3 battery C: the two probes whose f32 single-program DF residual
# exceeds HBM at (32,512) (~17 simultaneous o^2v^2 1-GB temps, measured
# 17.7 G of 15.75 G — the same wall twice: bf16_gap_probe's f32 pass and
# rt_df_at_scale's f32 prep solve).  Each step tries the north-star shape
# minus the pieces that cannot fit, then falls back one size.
set -u
cd /root/repo
LOG=${1:-/tmp/captures_c}
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

run_fb() {  # run_fb <name> <timeout> <cmd...> -- <fallback cmd...>
  name=$1; tmo=$2; shift 2
  primary=(); while [ "$1" != "--" ]; do primary+=("$1"); shift; done; shift
  echo "=== $name $(date -u +%H:%M:%S) ==="
  if ! probe > "$LOG/probe_$name.log" 2>&1; then
    echo "tunnel unhealthy before $name — stopping"
    exit 1
  fi
  timeout "$tmo" "${primary[@]}" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "$name rc=$rc  ($(date -u +%H:%M:%S))"
  if [ $rc -ne 0 ]; then
    echo "=== $name FALLBACK $(date -u +%H:%M:%S) ==="
    probe > "$LOG/probe_${name}_fb.log" 2>&1 || exit 1
    timeout "$tmo" "$@" > "$LOG/${name}_fb.log" 2>&1
    echo "${name}_fb rc=$?  ($(date -u +%H:%M:%S))"
    tail -3 "$LOG/${name}_fb.log"
  else
    tail -3 "$LOG/$name.log"
  fi
}

run_fb bf16gap 3600 \
  python examples/bf16_gap_probe.py --nv 384 -- \
  python examples/bf16_gap_probe.py --nv 256

run_fb rtdf 5400 \
  python examples/rt_df_at_scale.py --cc-iters 0 -- \
  python examples/rt_df_at_scale.py --cc-iters 0 --nv 384 --naux 1280

# Lambda-CC3 + CC3 one-pdm over factors at uracil scale: the solve
# re-runs warm (same shapes as battery B's uracil_cc3 step) with a small
# maxiter — the capture is the POST wall (extras rows / onepdm rows have
# the same no*v^3 slab class as the residual rows; untested at this size)
run_fb uracil_cc3_post 10800 \
  python examples/run_df_molecule.py df_cache/uracil_aug.npz \
    --model CC3 --precision SP --e-conv 1e-6 --r-conv 1e-5 \
    --maxiter 8 --post -- \
  true

echo "battery C complete $(date -u +%H:%M:%S); logs in $LOG"
