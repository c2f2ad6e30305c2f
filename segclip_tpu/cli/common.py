"""Shared CLI plumbing: model construction from torch or Orbax checkpoints."""
from __future__ import annotations

import os
from typing import Optional, Tuple

from segclip_tpu.config import Config, ModelConfig
from segclip_tpu.models.segclip import SegCLIP, init_segclip
from segclip_tpu.utils.logging import get_logger


def load_model(init_model: Optional[str], cfg: ModelConfig,
               infer_from_ckpt: bool = True) -> Tuple[SegCLIP, dict,
                                                      ModelConfig]:
    """Build SegCLIP + params.

    init_model may be:
      - a torch checkpoint (.pt TorchScript / .bin state dict): converted
        with the layers0/layers2 surgery; architecture inferred from tensor
        shapes (modeling.py:89-109 semantics) unless infer_from_ckpt=False;
      - an Orbax params directory (saved by this framework);
      - None: random init from cfg.
    """
    logger = get_logger()
    if init_model and (init_model.endswith(".pt")
                       or init_model.endswith(".bin")
                       or init_model.endswith(".pth")):
        from segclip_tpu.checkpoint.torch_convert import (
            convert_state_dict, infer_model_config, load_torch_state_dict,
            merge_params)
        sd = load_torch_state_dict(init_model)
        if infer_from_ckpt:
            cfg = infer_model_config(
                sd, first_stage_layer=cfg.first_stage_layer,
                group_num=cfg.group_num, cross_layer=cfg.cross_layer,
                use_vision_mae_recon=cfg.use_vision_mae_recon,
                use_text_mae_recon=cfg.use_text_mae_recon,
                use_seglabel=cfg.use_seglabel, max_words=cfg.max_words,
                compute_dtype=cfg.compute_dtype,
                attention_impl=cfg.attention_impl)
        model, params = init_segclip(cfg, seed=0)
        converted = convert_state_dict(sd, cfg)
        params = merge_params(params, converted, log_fn=logger.info)
        logger.info("loaded torch checkpoint %s", init_model)
        return model, params, cfg

    model, params = init_segclip(cfg, seed=0)
    if init_model:
        from segclip_tpu.checkpoint.orbax_io import restore_params
        params = restore_params(init_model, params)
        logger.info("restored Orbax params from %s", init_model)
    else:
        logger.info("random initialization (no --init-model)")
    return model, params, cfg
