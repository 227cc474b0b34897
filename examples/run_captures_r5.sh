#!/bin/bash
# Round-5 capture battery (VERDICT r4 "do this" items 1-3), engineered to
# survive its own failure modes (VERDICT r4 weak #5):
#   - probe-first: every step gates on a tiny-matmul tunnel health check
#   - checkpointed: w10_mixed uses solve_cc_mixed's stage-aware chk/resume
#     (a relaunch re-enters the correct stage; compiles cache-hit)
#   - budgeted: per-step timeouts sized to the round-4 measurements
# Steps are INDIVIDUALLY invokable (`run_captures_r5.sh w10`) so the
# orchestrator can schedule them around host-core contention: w10_mixed is
# an ACCURACY capture (tolerates the concurrent w14 factor prep); the
# uracil Lambda-CC3 END-TO-END WALL must run on a quiet host.
set -u
cd /root/repo
LOG=/tmp/captures_r5
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
  rc=$?
  echo "$name rc=$rc  ($(date -u +%H:%M:%S))"
  tail -3 "$LOG/$name.log"
  return $rc
}

step=${1:-w10}

case "$step" in
w10)
  # (H2O)_10 410 bf, DF-CCSD mixed precision to 1e-7 Eh (north-star
  # accuracy half).  Ring-free f32 step (the depth-4 ring measured
  # 17.9/15.75 GB OOM); f64 stage auto-splits + Jacobi.  chk/resume:
  # a relaunch after the floor skips straight to refinement.
  RESUME=""
  [ -f "$LOG/w10mx.chk.floor.npz" -o -f "$LOG/w10mx.chk.sp.npz" ] && RESUME="--resume"
  run_step w10_mixed 10800 python examples/run_df_molecule.py \
    df_cache/w10aug.npz --mixed --e-conv 1e-7 --r-conv 1e-6 \
    --sp-conv 1e-6 --refine-maxiter 15 --max-diis 0 --maxiter 80 \
    --chk "$LOG/w10mx.chk" --chk-every 25 $RESUME
  ;;
uracil)
  # uracil/aug-cc-pVDZ CC3 solve + Lambda-CC3 + one-pdm dipole over
  # factors, end-to-end wall (owed since round 3).  QUIET HOST ONLY.
  run_step uracil_cc3_post 10800 python examples/run_df_molecule.py \
    df_cache/uracil_aug.npz --model CC3 --precision SP --e-conv 1e-6 \
    --r-conv 1e-5 --maxiter 25 --post
  ;;
w14)
  # (H2O)_14 574 bf DF-CCSD SP — the ~600-bf real molecule.  Factors
  # rank-capped to naux=4200 (examples/recompress_npz.py: at naux=5414
  # the f32 factor blocks alone leave no HBM for any residual
  # formulation); the solver auto-selects the slab-scan residual past
  # the Bvv byte threshold.
  run_step w14_ccsd 10800 python examples/run_df_molecule.py \
    df_cache/w14aug_rc.npz --precision SP --e-conv 1e-6 --r-conv 1e-5 \
    --max-diis 0 --maxiter 60 \
    --chk "$LOG/w14.chk" --chk-every 20
  ;;
*)
  echo "unknown step $step (w10|uracil|w14)"; exit 2 ;;
esac
