#!/bin/bash
# Round-5 factor preparation chain (df_cache/ was wiped between rounds).
# Sequential on the single host core; cheapest first so captures unblock early:
#   uracil (minutes) -> w10 (north-star capture input) -> w14 (~600 bf, no recompress).
# Logs to /tmp/captures_r5/prep_*.log; sentinel files mark completion.
set -u
cd /root/repo
mkdir -p df_cache /tmp/captures_r5
LOG=/tmp/captures_r5

run_prep() {
  name=$1; tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S)"
  timeout "$tmo" "$@" > "$LOG/prep_$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)"
  tail -2 "$LOG/prep_$name.log"
  [ $rc -eq 0 ] && touch "$LOG/prep_$name.done"
}

run_prep uracil 7200 python examples/prepare_df_molecule.py \
  --mol uracil --basis aug-cc-pvdz --df-tol 1e-6 --out df_cache/uracil_aug.npz

run_prep w10 12000 python examples/prepare_df_molecule.py \
  --waters 10 --basis aug-cc-pvdz --df-tol 1e-6 --out df_cache/w10aug.npz

# w14: 574 bf. Recompression at this size is multi-hour (w12 was 4057 s);
# the SP solver pays only linearly in naux -> skip it.
run_prep w14 28800 python examples/prepare_df_molecule.py \
  --waters 14 --basis aug-cc-pvdz --df-tol 1e-6 --no-recompress \
  --out df_cache/w14aug.npz

echo "ALL PREPS DONE $(date -u +%H:%M:%S)"
