"""Zero-shot semantic segmentation: text banks, sliding-window inference,
mIoU, and visualization — a self-contained replacement for the reference's
mmseg/mmcv eval harness."""
