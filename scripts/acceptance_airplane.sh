#!/bin/bash
# One-command real-data acceptance run: ShapeNetCore55 airplane
# preprocess -> resample -> staged generative training -> 10-rep paper
# protocol evaluation (the table the reference exists for:
# MMD/COV/1-NNA under CD+EMD + JSD; reference
# scripts/train_airplane_gen.sh + scripts/run_evaluate_gen.sh).
#
# Usage:
#   scripts/acceptance_airplane.sh <shapenet_obj_dir> <work_dir>
#   scripts/acceptance_airplane.sh --synthetic <work_dir>   # dry run
#
# <shapenet_obj_dir> must contain all.csv + the unpacked ShapeNetCore.v2
# OBJ tree (the reference README's dataset download). --synthetic swaps
# in the generated jittered-primitive category (tiny shapes, minutes not
# days) to exercise every stage end-to-end without the dataset.
#
# Expected runtimes (v5e chip + the 1-core host of this environment):
#   preprocess     days of host CPU for the full 55-category set
#                  (multiprocessing pool; scale n_processes to cores);
#                  --synthetic: ~1 s
#   staged train   4 invocations (epochs 800/1200/1400/1450, lr
#                  2.56e-4 -> 4e-6), airplane category ~2.7k shapes:
#                  ~3.4 s/epoch on-chip at the fused-'fast' default
#                  (~1,262 clouds/s, BENCH_r04) -> ~4 h total;
#                  --synthetic: ~10 min
#   evaluate       10-rep generating protocol at 405 test shapes:
#                  ~10 min (9.7 measured end-to-end, RESULTS.md r4;
#                  BENCH_r04 protocol_min_10rep_est 9.8);
#                  --synthetic: ~3 min
#
# TPU-tunnel resilience: every device stage runs under
# GWTF_REQUIRE_BACKEND=tpu (CLIs exit immediately if jax silently fell
# back to CPU during a tunnel flap) and retries on failure every 90 s —
# train stages resume from the last checkpoint via --resume, so a flap
# mid-stage loses at most the steps since the last save cadence.
# pipefail: the eval stage pipes through tee — without it '|| exit 1'
# would test tee's status and a failed 7-hour run would print 'done'
set -u -o pipefail

SYNTHETIC=0
if [ "${1:-}" = "--synthetic" ]; then
  SYNTHETIC=1
  shift
  DATA_DIR=""
  WORK="${1:?usage: acceptance_airplane.sh --synthetic <work_dir>}"
else
  DATA_DIR="${1:?usage: acceptance_airplane.sh <shapenet_obj_dir> <work_dir>}"
  WORK="${2:?usage: acceptance_airplane.sh <shapenet_obj_dir> <work_dir>}"
fi
REPO="$(cd "$(dirname "$0")/.." && pwd)"
mkdir -p "$WORK"
cd "$REPO"

MODEL=airplane_gen_model
JOBID=acceptance
CONFIG="$WORK/config_acceptance.yaml"

# Device stages: fail fast off-TPU, retry through tunnel flaps.
# (GWTF_ACCEPT_BACKEND=cpu + GWTF_ACCEPT_JAX_PLATFORMS=cpu runs the
# whole pipeline on CPU — used by the dry-run test.)
run_tpu() {
  local tries=0
  until GWTF_REQUIRE_BACKEND="${GWTF_ACCEPT_BACKEND:-tpu}" \
        JAX_PLATFORMS="${GWTF_ACCEPT_JAX_PLATFORMS-}" python "$@"; do
    tries=$((tries + 1))
    if [ "$tries" -ge "${GWTF_ACCEPT_MAX_TRIES:-40}" ]; then
      echo "!! stage failed $tries times, giving up: $*" >&2
      return 1
    fi
    echo "-- stage failed (attempt $tries), retrying in 90s: $*" >&2
    sleep 90
  done
}

# ---- stage 1: data ----
if [ "$SYNTHETIC" = 1 ]; then
  echo "== [1/4] synthetic category (dry run) =="
  python - "$WORK" <<'PYEOF'
import sys
from go_with_the_flows_tpu.data.synthetic import write_synthetic_meshes_h5
write_synthetic_meshes_h5(
    sys.argv[1] + "/ShapeNetCore55v2_meshes_resampled.h5", n_shapes=48
)
PYEOF
else
  echo "== [1/4] preprocess ShapeNetCore55 (host CPU, long) =="
  python preprocess_shapenetcore.py "$DATA_DIR" "$WORK" \
    "$(nproc)" 64 || exit 1
  echo "== [1b/4] resample splits (seed 1, per category) =="
  python resample_shapenetcore.py \
    "$WORK/ShapeNetCore55v2_meshes.h5" || exit 1
fi

# ---- stage 2: config ----
python - "$REPO/configs/config_generative_modeling_airplane.yaml" \
  "$CONFIG" "$WORK" "$SYNTHETIC" <<'PYEOF'
import sys, yaml
src, dst, work, synthetic = sys.argv[1:5]
cfg = yaml.safe_load(open(src))
cfg["path2data"] = work
cfg["path2save"] = work + "/results"
if synthetic == "1":
    # dry run: the synthetic single-category h5 + a tiny model, so the
    # full pipeline (preprocess layout -> staged train/resume -> 10-rep
    # protocol) executes in minutes on any backend
    cfg.update(
        chosen_label=None, cloud_size=64, batch_size=8,
        n_components=2, params_reduce_mode="none",
        p_decoder_n_flows=2, p_decoder_n_features=8,
        g_prior_n_flows=2, g_prior_n_features=8,
        g_latent_space_size=8, g_posterior_n_layers=1,
        pc_enc_init_n_features=8, pc_enc_n_features=[8, 16],
    )
yaml.safe_dump(cfg, open(dst, "w"))
print("wrote", dst)
PYEOF

EPOCHS=(800 1200 1400 1450)
LRS=(0.000256 0.000064 0.000016 0.000004)
if [ "$SYNTHETIC" = 1 ]; then
  EPOCHS=(2 3 4 5)
fi

# ---- stage 3: staged training (reference train_airplane_gen.sh) ----
echo "== [2/4] staged training: epochs ${EPOCHS[*]} =="
run_tpu train_ae.py "$CONFIG" "$MODEL" "${EPOCHS[0]}" "${LRS[0]}" \
  --weights_type learned_weights --warmup_epoch 5 --jobid "$JOBID" \
  || exit 1
for i in 1 2 3; do
  # later stages resume; point the config at the stage-1 experiment dir
  # (train_ae writes logging_path back into the config on first run)
  run_tpu train_ae.py "$CONFIG" "$MODEL" "${EPOCHS[$i]}" "${LRS[$i]}" \
    --resume --resume_optimizer --weights_type learned_weights \
    --jobid "$JOBID" || exit 1
done

EXP_DIR="$WORK/results/${MODEL}_${JOBID}"

# ---- stage 4: the paper-protocol evaluation ----
echo "== [3/4] 10-rep generating protocol (CD+EMD+JSD) =="
EVAL_ARGS=(test 2048 2048 generating --weights_type learned_weights
           --reps 10 --f1_threshold_lst 0.0001 --cd --emd --jsd
           --unit_scale_evaluation)
if [ "$SYNTHETIC" = 1 ]; then
  EVAL_ARGS=(test 64 64 generating --weights_type learned_weights
             --reps 2 --f1_threshold_lst 0.0001 --cd --jsd --batch_size 8)
fi
run_tpu evaluate_ae.py "$EXP_DIR" "$MODEL.ckpt" "${EVAL_ARGS[@]}" \
  | tee "$WORK/acceptance_table.txt" || exit 1

echo "== [4/4] done: table in $WORK/acceptance_table.txt =="
