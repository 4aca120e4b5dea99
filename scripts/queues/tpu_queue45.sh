#!/bin/bash
# Queue 45 (round 4): the round-3 VERDICT's remaining protocol items, chained
# behind queue44 so the chip never idles.
#
#   1. HPO `param_medium` study (egnn_mc, 10M +-7% budget, 6 trials x 50
#      epochs) — the first multi-trial study at the 10M budget; the mode has
#      been implemented + unit-tested since round 2 but never run for real
#      (VERDICT #3).  egnn_mc is the validated floor-exit family (leaves the
#      1e-300 objective floor by epoch ~40, see hpo_param_small_egnn/README).
#   2. HPO `time_matched` demo (egnn_mc, 3 trials x 8 min wall-clock each) —
#      proves the reference's third mode end-to-end (reference default is
#      40 min/trial; 8 min is the same semantics on a round-sized budget).
#   3. GT-vs-GT metamacro noise floor at the BENCH shape N=100 (and one at
#      N=512) — the first fidelity signal at any N>5 (VERDICT #4 / weak #2).
#   4. A short-trained egnn_mc run AT N=100 scored through the in-run
#      macro/KS pipeline + a 6-draw battery at its best checkpoint — connects
#      the headline metric ("steps/s at N=100 with KS parity") to actual KS
#      evidence at that shape for the first time.
#
# Every step budgets against the hard DEADLINE with a reservation for its
# successors, so a long queue44 squeezes the big study first, not the
# never-run modes/shapes.
#
# Usage: bash tpu_queue45.sh <pid-to-wait-for> [deadline-epoch-seconds]
set -u
PIPE_PID=${1:?usage: tpu_queue45.sh <pid-to-wait-for> [deadline-epoch]}
DEADLINE=${2:-$(( $(date +%s) + 4 * 3600 ))}
WROOT=/root/repo/runs/r4
mkdir -p "$WROOT"
PKG=extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu

echo "[queue45] starting at $(date); waiting on pid $PIPE_PID"
while [ -d "/proc/$PIPE_PID" ]; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue45] deadline while waiting"; exit 1; }
  sleep 60
done
echo "[queue45] pid $PIPE_PID gone at $(date)"

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}
until probe_backend; do
  [ "$(date +%s)" -lt "$DEADLINE" ] || { echo "[queue45] deadline in gate"; exit 1; }
  sleep 60
done

left() { echo $(( DEADLINE - $(date +%s) )); }

# ---- step 1: param_medium study (reserve 90 min for steps 2-4) -----------
L=$(left)
if [ "$L" -gt 2400 ]; then
  B=$(( L - 5400 )); [ "$B" -gt 7200 ] && B=7200; [ "$B" -lt 1500 ] && B=1500
  echo "[queue45] step 1: HPO param_medium (egnn_mc, 6x50ep), ${B}s budget $(date)"
  ( cd /root/repo && timeout "$B" \
    python -m "$PKG.hpo.hpo" \
      --model_type egnn_mc --mode param_medium --trials 6 \
      --train_epochs 50 --steps_per_epoch 1000 --self_feed_limit_steps 999 \
      --study_dir "$WROOT/hpo_egnn_medium" \
      >> "$WROOT/hpo_medium.log" 2>&1 )
  echo "[queue45] step 1 rc=$? $(date)"
else
  echo "[queue45] step 1 skipped (only ${L}s left)"
fi

# ---- step 2: time_matched demo (reserve ~55 min for steps 3-4) -----------
L=$(left)
if [ "$L" -gt 2100 ]; then
  B=$(( L - 3300 )); [ "$B" -gt 2100 ] && B=2100; [ "$B" -lt 700 ] && B=700
  echo "[queue45] step 2: HPO time_matched (egnn_mc, 3 trials x 8 min), ${B}s budget $(date)"
  ( cd /root/repo && timeout "$B" \
    python -m "$PKG.hpo.hpo" \
      --model_type egnn_mc --mode time_matched --trials 3 --trial_minutes 8 \
      --train_epochs 80 --steps_per_epoch 1000 --self_feed_limit_steps 999 \
      --study_dir "$WROOT/hpo_egnn_timematched" \
      >> "$WROOT/hpo_timematched.log" 2>&1 )
  echo "[queue45] step 2 rc=$? $(date)"
else
  echo "[queue45] step 2 skipped (only ${L}s left)"
fi

# ---- step 3: GT-vs-GT noise floor at N=100 (N=512 only if roomy) ---------
# (skipped when the artifact already exists — the N=100 floor is
# chip-independent and may have been produced on CPU while queue44 trained)
L=$(left)
if [ -f "$WROOT/gtgt_n100/baseline_metamacros.json" ]; then
  echo "[queue45] step 3 already done (CPU side-channel)"
elif [ "$L" -gt 1500 ]; then
  echo "[queue45] step 3: GT-GT metamacros N=100 $(date)"
  ( cd /root/repo && timeout 1800 \
    python -m "$PKG.evaluation.studies" metamacros \
      --out "$WROOT/gtgt_n100" --num-atoms 100 --batch-size 16 \
      --sim-length 5000 --num-batches 8 \
      >> "$WROOT/gtgt.log" 2>&1 )
  echo "[queue45] N=100 rc=$? $(date)"
fi
L=$(left)
if [ -f "$WROOT/gtgt_n512/baseline_metamacros.json" ]; then
  echo "[queue45] step 3b already done"
elif [ "$L" -gt 3300 ]; then
  echo "[queue45] step 3b: GT-GT metamacros N=512 $(date)"
  ( cd /root/repo && timeout 2400 \
    python -m "$PKG.evaluation.studies" metamacros \
      --out "$WROOT/gtgt_n512" --num-atoms 512 --batch-size 8 \
      --sim-length 5000 --num-batches 6 \
      >> "$WROOT/gtgt.log" 2>&1 )
  echo "[queue45] N=512 rc=$? $(date)"
else
  echo "[queue45] step 3b deferred (only ${L}s left)"
fi

# ---- step 4: short-trained egnn_mc AT N=100, scored + battery ------------
L=$(left)
if [ "$L" -gt 1200 ]; then
  B=$(( L - 600 )); [ "$B" -gt 2700 ] && B=2700
  echo "[queue45] step 4: egnn_mc N=100 training (30 ep), ${B}s budget $(date)"
  WD="$WROOT/egnn_n100"; mkdir -p "$WD"
  ( cd "$WD" && timeout "$B" \
    python /root/repo/train.py --config /root/repo/config.yaml \
      --trainer.train_steps 30 --trainer.run_name egnn_n100 \
      --trainer.test_macros_every 10 --trainer.save_model_every 10 \
      --trainer.self_feed_limit_steps 999 \
      --dataloader.gravity_dataset.num_atoms 100 \
      >> "$WD/train.log" 2>&1 )
  echo "[queue45] step 4 train rc=$? $(date)"
  RD=$(ls -td "$WD"/runs/egnn_mc/* 2>/dev/null | head -1)
  if [ -n "$RD" ] && [ ! -f "$RD/ks_summary.json" ]; then
    # aggregate the in-run per-checkpoint macro JSONs (CPU-only, like
    # pipeline.py's score_run)
    ( cd "$WD" && PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 1200 \
      python /root/repo/ks_test.py "$RD" >> "$WD/score.log" 2>&1 )
  fi
  if [ -n "$RD" ] && [ -f "$RD/ks_summary.json" ]; then
    CK=$(python - "$RD" <<'EOF'
import json, sys
recs = json.load(open(f"{sys.argv[1]}/ks_summary.json")).get("results", [])
recs = [r for r in recs if r.get("combined_pvalue") is not None]
print(max(recs, key=lambda r: r["combined_pvalue"])["checkpoint"] if recs else "")
EOF
)
    if [ -n "$CK" ] && [ -f "$RD/checkpoints/$CK/model.ckpt" ]; then
      echo "[queue45] step 4 battery at ckpt $CK $(date)"
      timeout 1500 python /root/repo/self_feed.py --run_dir "$RD" \
        --checkpoint "checkpoints/$CK/model.ckpt" --draws 6 --seed 281 \
        --out "$RD/draws_ckpt$CK" >> "$WD/battery.log" 2>&1
      echo "[queue45] battery rc=$? $(date)"
    fi
  fi
else
  echo "[queue45] step 4 skipped (only ${L}s left)"
fi

echo "[queue45] ALL DONE $(date) — chip idle"
