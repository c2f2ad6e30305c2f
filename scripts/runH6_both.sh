#!/bin/bash
# Run H': the run-H both-captions recipe on the redesigned one-pair-per-
# shape holdout corpus (VERDICT r4 #2) — replicates the composed-query
# transfer probe with a holdout that has signal for EVERY possible
# winner class (run H's trio covered only 3 of 6 shapes).
#
# Protocol: the runs-N/P/Q sizing (24k scenes x 2 samples = 48k -> 500
# steps/epoch at B=96, 10-epoch cosine = 5,000 steps — the same t_total
# as run H's 60k x 4; the grounding window is step-count-bound,
# docs/PERF.md runs 7-8) with the ORIGINAL unmasked objective ("both"
# captions carry no class metadata; text_class would be 0 everywhere).
# Same scene rng stream as runs P/Q -> byte-identical images.
#   python -m segclip_tpu.cli.prepare_data shapes \
#     --out-dir /root/shapes24k_both_h6 --train-n 24000 --eval-n 300 \
#     --captions both --holdout
set -u
OUT=${1:-/root/runH6}
DATA=${2:-/root/shapes24k_both_h6}
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
