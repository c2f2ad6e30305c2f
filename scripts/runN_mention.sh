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
#
# Sizing: 24k scenes x 2 mention samples = 48k samples -> 500 steps/epoch
# at B=96; the 10-epoch cosine = 5,000 total steps, the SAME t_total as
# run H (60k both-caption scenes, 4 epochs).  The grounding window is
# step-count-bound, not epoch-bound (docs/PERF.md runs 7-8), so the
# schedules are equivalent where it matters; 24k is what the 1-core host
# can regenerate in-session (~25 scenes/s).  Same holdout trio, keep_best.
#
# Corpus: python -m segclip_tpu.cli.prepare_data shapes \
#   --out-dir /root/shapes24k_ment_holdout --train-n 24000 --eval-n 300 \
#   --captions mention --holdout
set -u
OUT=${1:-/root/runN}
DATA=${2:-/root/shapes24k_ment_holdout}
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
           train.keep_best=true \
           train.epochs_per_run=$PER_RUN train.checkpoint_every=2 \
    || exit $?
done
echo "=== run complete ==="
