#!/bin/bash
# Run P: run N's exact protocol with the false-negative-aware objective
# (model.infonce_mask=class) — the fix run N's diagnosis demands
# (docs/PERF.md "Run N": a mention caption truthfully matches ~29% of
# batch images; one-label CE floods the loss with mean 27.5 false
# negatives/row at B=96, and grounding is destroyed 12.5 -> 11.75).
# The mask removes TRUTHFUL same-class entries from the InfoNCE
# denominator using the per-sample class metadata the pipeline now ships
# (<name>_meta.sgr, written by `prepare_data shapes`).
#
# Everything else matches run N (scripts/runN_mention.sh): 24k mention
# scenes x 2 samples = 48k -> 500 steps/epoch at B=96, 10-epoch cosine =
# 5,000 steps (same t_total as run H), keep_best, checkpoint_every=2,
# segmented at 5 epochs/run for the axon host-RSS leak. The corpus is
# regenerated because (a) run N's predates the meta sidecar and (b) the
# holdout default is now one pair per shape (VERDICT r4 #2):
#   python -m segclip_tpu.cli.prepare_data shapes \
#     --out-dir /root/shapes24k_ment_h6 --train-n 24000 --eval-n 300 \
#     --captions mention --holdout
set -u
OUT=${1:-/root/runP}
DATA=${2:-/root/shapes24k_ment_h6}
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
