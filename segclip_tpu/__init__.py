"""segclip_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
open-vocabulary semantic segmentation with annotation-free pretraining.

Re-designed from scratch with the capabilities of the SegCLIP reference
(arXiv:2211.14813): a CLIP ViT-B/16 two-stage visual tower with a semantic
grouping bottleneck, trained with global-batch InfoNCE + MAE reconstruction +
superpixel-KL losses, plus a zero-shot segmentation inference/eval stack.

Layout (bottom-up):
  ops/        pure-function kernels & numerics (attention, grouping, masking,
              position embeddings; Pallas TPU kernels under ops/pallas)
  models/     flax.linen model tree (CLIP text/vision towers, SegViT,
              MAE decoders, SegCLIP losses)
  checkpoint/ Orbax checkpointing + torch state_dict converter
  data/       host input pipeline (tokenizer, transforms, record files)
  parallel/   device mesh + sharding rules + collectives
  train/      optimizer (fused-schedule AdamW), param groups, train step/loop
  evalseg/    zero-shot segmentation inference, mIoU, visualization
  cli/        command-line entry points
"""

__version__ = "0.1.0"
