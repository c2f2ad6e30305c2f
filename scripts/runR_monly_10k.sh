#!/bin/bash
# Run R: the optimization-time lever run Q's diagnosis demands
# (docs/PERF.md "Run Q"): image-level grounding is uniformly weak across
# ALL six classes (AUC 0.55-0.69) and final sim_loss ~ ln(24) — the
# model is EARLY, not captured by one class. Run R doubles both data
# diversity and steps: 48k mention-only scenes x 2 samples = 96k ->
# 1000 steps/epoch at B=96, 10-epoch cosine = 10,000 steps (2x the
# N/P/Q t_total), same masked objective, same recipe otherwise.
#   python -m segclip_tpu.cli.prepare_data shapes \
#     --out-dir /root/shapes48k_monly_h6 --train-n 48000 --eval-n 300 \
#     --captions mention-only --holdout
set -u
OUT=${1:-/root/runR}
DATA=${2:-/root/shapes48k_monly_h6}
EPOCHS=10
PER_RUN=5
export PYTHONPATH=/root/repo:/root/.axon_site
for seg in 1 2; do
  echo "=== segment $seg ==="
  python -m segclip_tpu.cli.train --datatype shapes --data-dir "$DATA" \
    --batch-size 96 --epochs $EPOCHS --lr 4e-4 --lower-lr 4e-4 \
    --warmup-proportion 0.1 --use-seglabel --use-vision-mae-recon \
    --eval-each-epoch --eval-data-root "$DATA/eval" \
    --num-workers 0 --output-dir "$OUT" --do-resume \
    --opts eval.dataset=shapes model.gumbel_tau=3.0 \
           model.group_balance_weight=1.0 \
           model.infonce_mask=class \
           train.keep_best=true \
           train.epochs_per_run=$PER_RUN train.checkpoint_every=2 \
    || exit $?
done
echo "=== run complete ==="
