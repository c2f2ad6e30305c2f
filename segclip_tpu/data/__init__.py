"""Host-side input pipeline: tokenizer, image transforms, superpixels,
record files, and the training data loader."""
