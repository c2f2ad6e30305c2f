#!/bin/bash
# Run N: the "richer caption negatives" lever from VERDICT r3 #3, informed
# by run E's diagnosis (docs/PERF.md): with full-scene captions InfoNCE
# concentrates gradient on ONE sufficient class (square by area; star at
# equal area) and the other shape names never ground.  The mention corpus
# (`prepare_data shapes --captions mention`) replaces the plain-full
# caption with a SINGLE-SHAPE mention ("a photo of a circle." /
# "a picture showing a red circle."), uniformly sampled over the scene's
# shapes — matching that caption requires the NAMED class's visual
# feature, and the sampling spreads that necessity evenly over classes.
# Identical recipe to run H otherwise (60k scenes, same holdout trio,
# 4-epoch cosine = 5k steps, keep_best).
set -u
OUT=${1:-/root/runN}
DATA=${2:-/root/shapes60k_ment_holdout}
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
           model.group_balance_weight=1.0 \
           train.keep_best=true \
           train.epochs_per_run=1 train.checkpoint_every=2 \
    || exit $?
done
echo "=== run complete ==="
