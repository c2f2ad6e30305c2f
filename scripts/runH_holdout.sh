#!/bin/bash
# Run H: the headline run-8 recipe (docs/PERF.md "Learning the shapes
# corpus": 60k scenes / 120k both-caption samples, 4-epoch cosine ending
# inside the ~4k-step grounding window) on the HOLDOUT corpus — three
# color×shape compositions excluded from every training image and caption
# (prepare_data shapes --holdout). The checkpoint is then probed with
# scripts/holdout_study.py for open-vocabulary compositional
# generalization. keep_best retains the peak-mIoU epoch.
# Segmented into 2-epoch resume chunks to bound host RSS under the
# tunneled-client transfer leak (docs/PERF.md).
set -u
OUT=${1:-/root/runH}
DATA=${2:-/root/shapes60k_holdout}
EPOCHS=4
PER_RUN=2
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
           train.epochs_per_run=$PER_RUN train.checkpoint_every=$PER_RUN \
    || exit $?
done
echo "=== run complete ==="
