"""flax.linen model tree: CLIP towers, SegViT grouping stack, MAE decoders,
and the SegCLIP loss head."""
