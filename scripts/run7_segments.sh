#!/bin/bash
# Run 7: the run-6 recipe at 3x the data (60k scenes / 120k both-caption
# samples). Run 5 showed the 20k corpus overfits its image-level
# contrastive task past ~3.7k steps (docs/PERF.md "Learning the shapes
# corpus"); the schedule fix (run 6) ends the cosine at the peak — this
# run attacks the cause instead: more data moves the overfit point out.
# Segmented into 3-epoch resume chunks (~3.75k steps) to bound host RSS
# under the tunneled-client transfer leak (docs/PERF.md).
set -u
OUT=${1:-/root/run7}
DATA=${2:-/root/shapes60k}
EPOCHS=12
PER_RUN=3
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
