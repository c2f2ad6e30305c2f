#!/bin/bash
# Run Q: mention-only corpus + the class mask — the single-winner
# isolation lever run P's result demands (docs/PERF.md "Run P").
#
# Run P showed infonce_mask=class removes the false-negative flood and
# restores grounding on the mention corpus (best 15.48 vs run N's
# 11.75), but the single-winner regime persists (square 19.55, rest 0).
# The remaining suspect is the 50% FULL-caption rows: their one-label CE
# still rewards ANY single sufficient feature (the run-E dynamic) and is
# untouched by the mask (text_class=0). "mention-only" packs TWO
# single-shape mentions per scene (distinct classes when the scene has
# >=2) and no full caption: every row is per-class supervision, and
# under the mask every row is SOLVED by grounding its named class.
#
# Sizing identical to runs N/P: 24k scenes x 2 samples = 48k -> 500
# steps/epoch at B=96, 10-epoch cosine = 5,000 steps, keep_best,
# checkpoint_every=2, segmented at 5 epochs/run (axon host-RSS leak).
# Same scene rng stream -> the images are byte-identical to run P's.
#   python -m segclip_tpu.cli.prepare_data shapes \
#     --out-dir /root/shapes24k_monly_h6 --train-n 24000 --eval-n 300 \
#     --captions mention-only --holdout
set -u
OUT=${1:-/root/runQ}
DATA=${2:-/root/shapes24k_monly_h6}
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
