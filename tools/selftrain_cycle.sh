#!/usr/bin/env bash
# End-to-end LEOD self-training cycle on synthetic Gen1-format data
# (reference workflow: docs/benchmark.md:58-141 — WSOD teacher ->
# pseudo-label generation with TTA + tracking -> soft student ->
# evaluation). Runs on the TPU by default (~40 min); CYCLE_CPU=1 forces
# CPU. Exercises the SHARDED pseudo-generation CLI path (2 sequential
# shards into one save dir) and scores the merged dataset once.
#
# Usage: bash tools/selftrain_cycle.sh [workdir]
#
# CYCLE_RESUME=1 makes the cycle restartable after an interruption
# (chip outage, SIGKILL, reboot): the workdir is kept, stages whose
# `.done_N` marker exists are skipped, and interrupted train stages
# continue from their newest checkpoint (--auto-resume). A round-3 TPU
# outage killed a cycle at student step ~180/300 and the hand-written
# resume script died with /tmp — this flag replaces that script.
set -euo pipefail
cd "$(dirname "$0")/.."

WORK=${1:-/tmp/st_cycle_r3}
STEPS_TEACHER=${STEPS_TEACHER:-300}
STEPS_STUDENT=${STEPS_STUDENT:-300}
NUM_TRAIN=${NUM_TRAIN:-6}     # synthetic train sequences
NUM_REPRS=${NUM_REPRS:-64}    # event reprs per sequence
LABEL_EVERY=${LABEL_EVERY:-2} # labeled-frame spacing (pre-WSOD-subsample)
# RECIPE SENSITIVITY: the full gen1 TBPTT recipe (bs 8, L=21) is what
# makes the sparse-label WSOD teacher learn. Short-window runs
# (bs 4, L=8) leave box regression stuck at IoU~0 — the 1-iou^2 loss
# has a vanishing gradient when predictions never overlap, dynamic-k
# stays 1, and train AP lands at 0 even after 2000 steps (measured).
BATCH=${BATCH:-8}
SEQ_LEN=${SEQ_LEN:-21}
# Model size: the reference self-training protocol is for BASE-size
# models (reference docs/benchmark.md:57-135); tiny is the fast debug
# setting. Override with SIZE=base for the model-faithful cycle.
SIZE=${SIZE:-tiny}
# Long TPU runs disable the timed mid-run checkpoint (CLAUDE.md: the
# one observed chip-wedging hang was inside that save); end-of-stage
# saves still happen. Override with CKPT_MIN for CPU debugging.
CKPT_MIN=${CKPT_MIN:-600}
# gate on the VALUE: ${CYCLE_CPU:+--cpu} would force CPU for
# CYCLE_CPU=0 too (:+ substitutes for any non-empty value)
CPU_FLAG=""
if [ "${CYCLE_CPU:-0}" = 1 ]; then CPU_FLAG=--cpu; fi
if [ "${CYCLE_RESUME:-0}" = 1 ]; then
  mkdir -p "$WORK"
  echo "resuming cycle in $WORK (done: $(cd "$WORK" && ls .done_* 2>/dev/null | tr '\n' ' '))"
else
  rm -rf "$WORK"; mkdir -p "$WORK"
fi
# done "$N": stage N already completed in a previous invocation?
done_stage() { [ -e "$WORK/.done_$1" ]; }
mark_done() { touch "$WORK/.done_$1"; }

if done_stage 0; then echo "== 0. synthetic dataset == (done, skip)"; else
echo "== 0. synthetic dataset =="
python - "$WORK/data" "$NUM_TRAIN" "$NUM_REPRS" "$LABEL_EVERY" <<'EOF'
import sys
from leod_tpu.data.synthetic import generate_dataset
generate_dataset(sys.argv[1], num_train=int(sys.argv[2]), num_val=4,
                 num_test=0, num_reprs=int(sys.argv[3]),
                 label_every=int(sys.argv[4]), first_label_repr=11)
print("dataset at", sys.argv[1])
EOF
mark_done 0; fi

if done_stage 1; then echo "== 1. WSOD teacher == (done, skip)"; else
echo "== 1. WSOD teacher (25% labels, $STEPS_TEACHER steps) =="
python cli/train.py --dataset gen1 --size "$SIZE" --path "$WORK/data" \
    --ratio 0.25 --steps "$STEPS_TEACHER" --batch-size "$BATCH" --seq-len "$SEQ_LEN" \
    --ckpt-every-min "$CKPT_MIN" --auto-resume \
    --save-dir "$WORK/runs" --exp-name teacher --val-every 0 $CPU_FLAG
mark_done 1; fi

if done_stage 2; then echo "== 2. teacher eval == (done, skip)"; else
echo "== 2. teacher eval =="
python cli/val.py --dataset gen1 --size "$SIZE" --path "$WORK/data" --split val \
    --seq-len "$SEQ_LEN" --ckpt "$WORK/runs/teacher/ckpt_last" $CPU_FLAG \
    | tee "$WORK/teacher_eval.json"
mark_done 2; fi

if done_stage 3; then echo "== 3. pseudo-label generation == (done, skip)"; else
echo "== 3. pseudo-label generation (2 shards, hflip TTA) =="
# a re-run after an interruption regenerates both shards: predict.py
# overwrites per-sequence outputs, so a partial first attempt is safe
for SHARD in 0 1; do
  python cli/predict.py --dataset gen1 --size "$SIZE" --path "$WORK/data" \
      --ratio 0.25 --ckpt "$WORK/runs/teacher/ckpt_last" \
      --save-dir "$WORK/pseudo" --seq-len "$SEQ_LEN" --batch-size 3 \
      --tta-hflip --obj-thresh 0.3 0.15 --cls-thresh 0.3 0.15 \
      --min-track-len 3 --conf 0.05 \
      --shard-index "$SHARD" --num-shards 2 $CPU_FLAG
done
mark_done 3; fi

if done_stage 4; then echo "== 4. pseudo-dataset score == (done, skip)"; else
echo "== 4. score merged pseudo dataset vs withheld GT =="
python cli/val_dst.py --dataset gen1 --path "$WORK/pseudo" \
    --orig-path "$WORK/data" --ratio 0.25 --verify \
    | tee "$WORK/pseudo_score.json"
mark_done 4; fi

if done_stage 5; then echo "== 5. soft student == (done, skip)"; else
echo "== 5. soft student on the pseudo dataset =="
python cli/train.py --dataset gen1 --size "$SIZE" --path "$WORK/pseudo" \
    --soft --weight "$WORK/runs/teacher/ckpt_last" \
    --steps "$STEPS_STUDENT" --batch-size "$BATCH" --seq-len "$SEQ_LEN" --lr 5e-4 \
    --ckpt-every-min "$CKPT_MIN" --auto-resume \
    --save-dir "$WORK/runs" --exp-name student --val-every 0 $CPU_FLAG
mark_done 5; fi

if done_stage 6; then echo "== 6. student eval == (done, skip)"; else
echo "== 6. student eval =="
python cli/val.py --dataset gen1 --size "$SIZE" --path "$WORK/data" --split val \
    --seq-len "$SEQ_LEN" --ckpt "$WORK/runs/student/ckpt_last" $CPU_FLAG \
    | tee "$WORK/student_eval.json"
mark_done 6; fi

echo "cycle complete: teacher/student eval JSON + pseudo score in $WORK"
