#!/bin/bash
# Run G: the group_num lever from VERDICT r3 #3 — 4 semantic groups
# instead of the reference's 8, on the unchanged holdout corpus/recipe
# (run H baseline).  Hypothesis worth testing either way: scenes have at
# most 3 shapes + background, so 4 groups are sufficient per image, and
# fewer centers means less center competition during the grounding
# window (each group aggregates more patches → more superpixel-KL and
# contrastive support per group).
set -u
OUT=${1:-/root/runG}
DATA=${2:-/root/shapes60k_holdout}
EPOCHS=4
export PYTHONPATH=/root/repo:/root/.axon_site
for seg in 1 2 3 4; do
  echo "=== segment $seg ==="
  python -m segclip_tpu.cli.train --datatype shapes --data-dir "$DATA" \
    --batch-size 96 --epochs $EPOCHS --lr 4e-4 --lower-lr 4e-4 \
    --warmup-proportion 0.1 --use-seglabel --use-vision-mae-recon \
    --eval-each-epoch --eval-data-root "$DATA/eval" \
    --num-workers 0 --output-dir "$OUT" --do-resume \
    --opts eval.dataset=shapes model.gumbel_tau=3.0 \
           model.group_balance_weight=1.0 model.group_num=4 \
           train.keep_best=true \
           train.epochs_per_run=1 train.checkpoint_every=2 \
    || exit $?
done
echo "=== run complete ==="
