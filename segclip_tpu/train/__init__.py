"""Training: fused-schedule AdamW, param groups/freezing, the pjit train
step, and the epoch loop."""
