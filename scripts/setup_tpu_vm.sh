#!/bin/bash
# Provision a Cloud TPU VM and deploy this framework onto it.
#
# TPU-native analogue of the reference's Lambda Labs provisioning script
# (helper_scripts/setup_lambda_full.sh): create capacity (with retry),
# bootstrap the environment, deploy the repo, smoke-test, and leave a
# ready-to-train box — except here there is no Docker/CUDA wheel matrix to
# orchestrate: the stack is pure JAX, so the bootstrap is `pip install .`.
#
# Usage:
#   ./setup_tpu_vm.sh [-n NAME] [-z ZONE] [-a ACCEL] [-v VERSION] [-r REPO]
#                     [-p PROJECT] [--spot] [--delete] [-h]
#
# Defaults target a single-host v5e; multi-host slices (e.g. v5litepod-16)
# work unchanged — the worker loop runs every step on all workers and the
# framework's parallel.mesh.initialize_distributed() spans the slice.
set -u

# --- Default configuration (env-overridable, flags win) -------------------
TPU_NAME="${TPU_NAME:-nbody-tpu}"
ZONE="${ZONE:-us-central1-a}"
ACCEL="${ACCEL:-v5litepod-8}"
RUNTIME_VERSION="${RUNTIME_VERSION:-v2-alpha-tpuv5-lite}"
PROJECT="${PROJECT:-}"
REPO_URL="${REPO_URL:-}"              # empty: rsync the local checkout
SPOT="${SPOT:-0}"
RETRY_SECONDS="${RETRY_SECONDS:-120}" # capacity-retry backoff
TMUX_SESSION="${TMUX_SESSION:-nbody}"

usage() {
  sed -n '2,16p' "$0" | sed 's/^# \{0,1\}//'
  cat <<EOF
Options:
  -n NAME      TPU VM name             (default: $TPU_NAME)
  -z ZONE      GCP zone                (default: $ZONE)
  -a ACCEL     accelerator type        (default: $ACCEL)
  -v VERSION   TPU runtime version     (default: $RUNTIME_VERSION)
  -p PROJECT   GCP project             (default: gcloud config)
  -r REPO_URL  git URL to clone        (default: rsync this checkout)
  --spot       request preemptible capacity
  --delete     delete the TPU VM and exit
  -h           this help
EOF
}

DELETE=0
while [ $# -gt 0 ]; do
  case "$1" in
    -n) TPU_NAME="$2"; shift 2 ;;
    -z) ZONE="$2"; shift 2 ;;
    -a) ACCEL="$2"; shift 2 ;;
    -v) RUNTIME_VERSION="$2"; shift 2 ;;
    -p) PROJECT="$2"; shift 2 ;;
    -r) REPO_URL="$2"; shift 2 ;;
    --spot) SPOT=1; shift ;;
    --delete) DELETE=1; shift ;;
    -h|--help) usage; exit 0 ;;
    *) echo "unknown option: $1" >&2; usage; exit 1 ;;
  esac
done

PROJ_ARGS=()
[ -n "$PROJECT" ] && PROJ_ARGS=(--project "$PROJECT")
GC=(gcloud compute tpus tpu-vm)

command_exists() { command -v "$1" >/dev/null 2>&1; }

# --- Prerequisites ---------------------------------------------------------
command_exists gcloud || { echo "gcloud CLI is required" >&2; exit 1; }
if [ -z "$REPO_URL" ]; then
  REPO_DIR="$(cd "$(dirname "$0")/.." && pwd)"
  [ -f "$REPO_DIR/pyproject.toml" ] || {
    echo "cannot locate the repo root (no pyproject.toml above $0)" >&2
    exit 1
  }
fi

if [ "$DELETE" = 1 ]; then
  "${GC[@]}" delete "$TPU_NAME" --zone "$ZONE" "${PROJ_ARGS[@]}" --quiet
  exit $?
fi

# --- 1. Create capacity (retry until available, Ctrl-C to abort) ----------
if ! "${GC[@]}" describe "$TPU_NAME" --zone "$ZONE" "${PROJ_ARGS[@]}" \
    >/dev/null 2>&1; then
  CREATE_ARGS=(create "$TPU_NAME" --zone "$ZONE" "${PROJ_ARGS[@]}"
               --accelerator-type "$ACCEL" --version "$RUNTIME_VERSION")
  [ "$SPOT" = 1 ] && CREATE_ARGS+=(--spot)
  until "${GC[@]}" "${CREATE_ARGS[@]}"; do
    echo "[setup] no capacity for $ACCEL in $ZONE; retrying in ${RETRY_SECONDS}s"
    sleep "$RETRY_SECONDS"
  done
else
  echo "[setup] TPU VM $TPU_NAME already exists — reusing"
fi

tpu_ssh() {  # run a command on every worker of the slice
  "${GC[@]}" ssh "$TPU_NAME" --zone "$ZONE" "${PROJ_ARGS[@]}" \
    --worker=all --command "$1"
}

# --- 2. Deploy the framework ----------------------------------------------
if [ -n "$REPO_URL" ]; then
  tpu_ssh "[ -d nbody-tpu ] || git clone '$REPO_URL' nbody-tpu"
else
  # rsync the local checkout (excluding run artifacts) to every worker
  TMP_TAR=$(mktemp /tmp/nbody_repo.XXXXXX.tar.gz)
  tar -C "$REPO_DIR" -czf "$TMP_TAR" \
    --exclude .git --exclude runs --exclude saved_simulations \
    --exclude '__pycache__' --exclude '*.so' .
  "${GC[@]}" scp "$TMP_TAR" "$TPU_NAME":/tmp/nbody_repo.tar.gz \
    --zone "$ZONE" "${PROJ_ARGS[@]}" --worker=all
  rm -f "$TMP_TAR"
  tpu_ssh "mkdir -p nbody-tpu && tar -xzf /tmp/nbody_repo.tar.gz -C nbody-tpu"
fi

# --- 3. Bootstrap: TPU jax + the framework + native kernels ---------------
tpu_ssh "
  set -e
  cd nbody-tpu
  pip install -q --upgrade pip
  pip install -q 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
  pip install -q .[precision,test]
  python -m extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.native.build || true
"

# --- 4. Smoke test: devices visible + one tiny end-to-end train step ------
tpu_ssh "
  set -e
  cd nbody-tpu
  python -c 'import jax; ds = jax.devices(); print(len(ds), ds[0].platform); assert ds[0].platform == \"tpu\"'
  python train.py --config config.yaml --trainer.train_steps 1 \
    --trainer.steps_per_epoch 5 --trainer.test_macros_every 99 \
    --dataloader.batch_size 8 --dataloader.gravity_dataset.sim_length 400
"

# --- 5. Leave a tmux session ready for long runs (worker 0) ---------------
"${GC[@]}" ssh "$TPU_NAME" --zone "$ZONE" "${PROJ_ARGS[@]}" --worker=0 \
  --command "tmux has-session -t $TMUX_SESSION 2>/dev/null || tmux new-session -d -s $TMUX_SESSION -c ~/nbody-tpu"

cat <<EOF
[setup] DONE. Next steps:
  train:  gcloud compute tpus tpu-vm ssh $TPU_NAME --zone $ZONE -- \\
            'cd nbody-tpu && python train.py --config config.yaml --main.model_type ponita'
  bench:  ... 'cd nbody-tpu && python bench.py'
  attach: ... -- -t 'tmux attach -t $TMUX_SESSION'
  delete: $0 --delete -n $TPU_NAME -z $ZONE
EOF
