#!/bin/bash
# Run M: the grounding-margin lever from VERDICT r3 #3 — global batch 192
# (2x the run-8 recipe) inside the ~4k-step grounding window. Rationale:
# every 20k/60k run peaked at the same STEP count (~3.7k, docs/PERF.md
# "Learning the shapes corpus"), and at B=96 InfoNCE sees duplicate-scene
# false negatives that a larger batch both dilutes and compensates with
# 2x the negatives per step. 6-epoch cosine = 3.75k steps at B=192 ends
# inside the window with every step on 2x the data of run 8's.
# epochs_per_run=1: B=192 doubles the per-step transfer leak
# (~25 MB/step), so segments stay short.
# model.remat=true is REQUIRED at B=192: without it the step's live
# activations need ~13.8 GB temp + 2.3 GB args > v5e-1 16 GB HBM and the
# tunneled worker dies instead of raising (measured via AOT
# compiled.memory_analysis(); remat cuts temp to 3.87 GB). Numerics are
# unchanged (pure recompute).
set -u
OUT=${1:-/root/runM}
DATA=${2:-/root/shapes60k_holdout}
EPOCHS=6
export PYTHONPATH=/root/repo:/root/.axon_site
for seg in 1 2 3 4 5 6; do
  echo "=== segment $seg ==="
  python -m segclip_tpu.cli.train --datatype shapes --data-dir "$DATA" \
    --batch-size 192 --epochs $EPOCHS --lr 4e-4 --lower-lr 4e-4 \
    --warmup-proportion 0.1 --use-seglabel --use-vision-mae-recon \
    --eval-each-epoch --eval-data-root "$DATA/eval" \
    --num-workers 0 --output-dir "$OUT" --do-resume \
    --opts eval.dataset=shapes model.gumbel_tau=3.0 \
           model.group_balance_weight=1.0 model.remat=true \
           train.keep_best=true \
           train.epochs_per_run=1 train.checkpoint_every=2 \
    || exit $?
done
echo "=== run complete ==="
