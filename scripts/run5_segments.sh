#!/bin/bash
# Headline learning run (docs/PERF.md "Learning the shapes corpus", run 5):
# 20-epoch cosine, full recipe, segmented into resume chunks of 5 epochs so
# host RSS stays bounded under the tunneled-client transfer leak
# (docs/PERF.md "Host-memory leak in the tunnel client").
set -u
OUT=${1:-/root/run5}
DATA=${2:-/root/shapes_data}
EPOCHS=20
PER_RUN=5
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
           train.epochs_per_run=$PER_RUN train.checkpoint_every=$PER_RUN \
    || exit $?
done
echo "=== run complete ==="
