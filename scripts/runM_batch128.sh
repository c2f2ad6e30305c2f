#!/bin/bash
# Run M' (revised): the grounding-margin lever from VERDICT r3 #3 at the
# largest per-chip batch that EXECUTES on v5e-1 without remat — B=128
# (+33% InfoNCE negatives per step vs the run-8 recipe's 96).
#
# Why not the originally planned B=192: it does not execute on this chip.
# Without remat the step needs ~18 GB temp (the sweep measured 9.05 GB at
# B=96, 11.66 at B=128, linear in B) > 16 GB HBM; WITH remat the AOT
# memory analysis says it fits (3.87 GB temp) but execution still killed
# the tunneled worker twice (~35 min recovery each), so B=192 is
# operationally off the table on this host (docs/PERF.md "Memory levers").
#
# 4-epoch cosine at B=128 = 3748 steps — ends inside the ~4k-step
# grounding window (docs/PERF.md "Learning the shapes corpus"), with every
# step seeing 4/3 of run H's negatives on the identical holdout corpus.
set -u
OUT=${1:-/root/runM}
DATA=${2:-/root/shapes60k_holdout}
EPOCHS=4
export PYTHONPATH=/root/repo:/root/.axon_site
for seg in 1 2 3 4; do
  echo "=== segment $seg ==="
  python -m segclip_tpu.cli.train --datatype shapes --data-dir "$DATA" \
    --batch-size 128 --epochs $EPOCHS --lr 4e-4 --lower-lr 4e-4 \
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
