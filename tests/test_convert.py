"""Torch-checkpoint converter tests: key surgery, layout transposes, grouped
conv mapping, and merge semantics — using synthetic state dicts with the
reference's key names and torch modules as layout oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from segclip_tpu.config import ModelConfig
from segclip_tpu.checkpoint.torch_convert import (apply_layer_surgery,
                                                  convert_state_dict,
                                                  infer_model_config,
                                                  merge_params, strip_prefix)
from segclip_tpu.models.layers import GroupedLinear
from segclip_tpu.models.segclip import init_segclip

RNG = np.random.default_rng(7)

TINY = ModelConfig(
    image_resolution=32, vision_patch_size=8, vision_width=64,
    vision_layers=4, first_stage_layer=3, group_num=4, cross_layer=1,
    context_length=16, vocab_size=512, transformer_width=64,
    transformer_layers=2, embed_dim=32, max_words=12,
    use_vision_mae_recon=True, use_text_mae_recon=True,
    mae_decoder_depth=1, mae_decoder_num_heads=2, compute_dtype="float32")


def test_layer_surgery():
    sd = {f"visual.transformer.resblocks.{i}.ln_1.weight": np.zeros(4)
          for i in range(4)}
    out = apply_layer_surgery(sd, first_stage_layer=3)
    assert "visual.transformer.layers0.0.ln_1.weight" in out
    assert "visual.transformer.layers0.2.ln_1.weight" in out
    assert "visual.transformer.layers2.0.ln_1.weight" in out
    assert not any("resblocks" in k for k in out)


def test_strip_prefix():
    sd = {"clip.visual.proj": np.zeros(2), "vis_mae_decoder.mask_token":
          np.zeros(2), "input_resolution": np.asarray(224)}
    out = strip_prefix(sd)
    assert set(out) == {"visual.proj", "vis_mae_decoder.mask_token"}


def test_infer_model_config():
    sd = {}
    w, p, grid, layers = 64, 8, 4, 4
    sd["visual.conv1.weight"] = np.zeros((w, 3, p, p))
    for i in range(layers):
        sd[f"visual.transformer.resblocks.{i}.attn.in_proj_weight"] = \
            np.zeros((3 * w, w))
    sd["visual.positional_embedding"] = np.zeros((grid * grid + 1, w))
    sd["text_projection"] = np.zeros((64, 32))
    sd["positional_embedding"] = np.zeros((16, 64))
    sd["token_embedding.weight"] = np.zeros((512, 64))
    sd["ln_final.weight"] = np.zeros(64)
    for i in range(2):
        sd[f"transformer.resblocks.{i}.attn.in_proj_weight"] = \
            np.zeros((3 * 64, 64))
    cfg = infer_model_config(sd, first_stage_layer=3)
    assert cfg.image_resolution == 32 and cfg.vision_width == 64
    assert cfg.vision_layers == 4 and cfg.vision_patch_size == 8
    assert cfg.embed_dim == 32 and cfg.transformer_layers == 2
    assert cfg.vocab_size == 512 and cfg.context_length == 16


def _synth_reference_state_dict(cfg: ModelConfig) -> dict:
    """Random tensors under the reference's key naming for every component."""
    sd = {}
    w, tw, e = cfg.vision_width, cfg.transformer_width, cfg.embed_dim
    p = cfg.vision_patch_size
    n = cfg.num_patches

    def block(prefix, d):
        sd[f"{prefix}.ln_1.weight"] = RNG.normal(size=d).astype(np.float32)
        sd[f"{prefix}.ln_1.bias"] = RNG.normal(size=d).astype(np.float32)
        sd[f"{prefix}.ln_2.weight"] = RNG.normal(size=d).astype(np.float32)
        sd[f"{prefix}.ln_2.bias"] = RNG.normal(size=d).astype(np.float32)
        sd[f"{prefix}.attn.in_proj_weight"] = RNG.normal(size=(3 * d, d)).astype(np.float32)
        sd[f"{prefix}.attn.in_proj_bias"] = RNG.normal(size=3 * d).astype(np.float32)
        sd[f"{prefix}.attn.out_proj.weight"] = RNG.normal(size=(d, d)).astype(np.float32)
        sd[f"{prefix}.attn.out_proj.bias"] = RNG.normal(size=d).astype(np.float32)
        sd[f"{prefix}.mlp.c_fc.weight"] = RNG.normal(size=(4 * d, d)).astype(np.float32)
        sd[f"{prefix}.mlp.c_fc.bias"] = RNG.normal(size=4 * d).astype(np.float32)
        sd[f"{prefix}.mlp.c_proj.weight"] = RNG.normal(size=(d, 4 * d)).astype(np.float32)
        sd[f"{prefix}.mlp.c_proj.bias"] = RNG.normal(size=d).astype(np.float32)

    # text
    sd["token_embedding.weight"] = RNG.normal(size=(cfg.vocab_size, tw)).astype(np.float32)
    sd["positional_embedding"] = RNG.normal(size=(cfg.context_length, tw)).astype(np.float32)
    sd["text_projection"] = RNG.normal(size=(tw, e)).astype(np.float32)
    sd["logit_scale"] = np.asarray(2.6593, np.float32)
    sd["ln_final.weight"] = RNG.normal(size=tw).astype(np.float32)
    sd["ln_final.bias"] = RNG.normal(size=tw).astype(np.float32)
    for i in range(cfg.transformer_layers):
        block(f"transformer.resblocks.{i}", tw)
    # vision
    sd["visual.conv1.weight"] = RNG.normal(size=(w, 3, p, p)).astype(np.float32)
    sd["visual.class_embedding"] = RNG.normal(size=w).astype(np.float32)
    sd["visual.positional_embedding"] = RNG.normal(size=(n + 1, w)).astype(np.float32)
    sd["visual.proj"] = RNG.normal(size=(w, e)).astype(np.float32)
    for ln in ("ln_pre", "ln_post"):
        sd[f"visual.{ln}.weight"] = RNG.normal(size=w).astype(np.float32)
        sd[f"visual.{ln}.bias"] = RNG.normal(size=w).astype(np.float32)
    for i in range(cfg.vision_layers):
        block(f"visual.transformer.resblocks.{i}", w)
    for i in range(cfg.vision_layers - cfg.first_stage_layer):
        block(f"visual.transformer.layers_mae2.{i}", w)
    # semantic learner
    sl = "visual.transformer.semantic_layer2"
    g = cfg.vision_heads
    sd[f"{sl}.semantic_center"] = RNG.normal(size=(cfg.group_num, w)).astype(np.float32)
    for ln in ("norm", "cross_ln", "k_ln"):
        sd[f"{sl}.{ln}.weight"] = RNG.normal(size=w).astype(np.float32)
        sd[f"{sl}.{ln}.bias"] = RNG.normal(size=w).astype(np.float32)
    sd[f"{sl}.k_conv.weight"] = RNG.normal(size=(w, w // g, 1)).astype(np.float32)
    sd[f"{sl}.v_conv.weight"] = RNG.normal(size=(w, w // g, 1)).astype(np.float32)
    for i in range(cfg.cross_layer):
        ca = f"{sl}.cross_att.{i}"
        for ln in ("ln_x", "ln_k", "ln_2"):
            sd[f"{ca}.{ln}.weight"] = RNG.normal(size=w).astype(np.float32)
            sd[f"{ca}.{ln}.bias"] = RNG.normal(size=w).astype(np.float32)
        sd[f"{ca}.attn.in_proj_weight"] = RNG.normal(size=(3 * w, w)).astype(np.float32)
        sd[f"{ca}.attn.in_proj_bias"] = RNG.normal(size=3 * w).astype(np.float32)
        sd[f"{ca}.attn.out_proj.weight"] = RNG.normal(size=(w, w)).astype(np.float32)
        sd[f"{ca}.attn.out_proj.bias"] = RNG.normal(size=w).astype(np.float32)
        sd[f"{ca}.mlp.c_fc.weight"] = RNG.normal(size=(4 * w, w)).astype(np.float32)
        sd[f"{ca}.mlp.c_fc.bias"] = RNG.normal(size=4 * w).astype(np.float32)
        sd[f"{ca}.mlp.c_proj.weight"] = RNG.normal(size=(w, 4 * w)).astype(np.float32)
        sd[f"{ca}.mlp.c_proj.bias"] = RNG.normal(size=w).astype(np.float32)
    sd[f"{sl}.proj_o.ln.weight"] = RNG.normal(size=w).astype(np.float32)
    sd[f"{sl}.proj_o.ln.bias"] = RNG.normal(size=w).astype(np.float32)
    sd[f"{sl}.proj_o.mlp.fc1.weight"] = RNG.normal(size=(4 * w, w)).astype(np.float32)
    sd[f"{sl}.proj_o.mlp.fc1.bias"] = RNG.normal(size=4 * w).astype(np.float32)
    sd[f"{sl}.proj_o.mlp.fc2.weight"] = RNG.normal(size=(w, 4 * w)).astype(np.float32)
    sd[f"{sl}.proj_o.mlp.fc2.bias"] = RNG.normal(size=w).astype(np.float32)
    # reconstruct
    rc = "visual.transformer.reconstruct_layer2.rec_proj_a.a_fc"
    sd[f"{rc}.weight"] = RNG.normal(size=(cfg.group_num, cfg.group_num)).astype(np.float32)
    sd[f"{rc}.bias"] = RNG.normal(size=cfg.group_num).astype(np.float32)
    # mae decoders
    for name, dim, dec, pred in (
            ("vis_mae_decoder", w, w // 2, p * p * 3),
            ("seq_mae_decoder", e, e // 2, cfg.vocab_size)):
        sd[f"{name}.decoder_embed.weight"] = RNG.normal(size=(dec, dim)).astype(np.float32)
        sd[f"{name}.decoder_embed.bias"] = RNG.normal(size=dec).astype(np.float32)
        sd[f"{name}.mask_token"] = RNG.normal(size=(1, 1, dec)).astype(np.float32)
        sd[f"{name}.decoder_norm.weight"] = RNG.normal(size=dec).astype(np.float32)
        sd[f"{name}.decoder_norm.bias"] = RNG.normal(size=dec).astype(np.float32)
        sd[f"{name}.decoder_pred.weight"] = RNG.normal(size=(pred, dec)).astype(np.float32)
        sd[f"{name}.decoder_pred.bias"] = RNG.normal(size=pred).astype(np.float32)
        for i in range(cfg.mae_decoder_depth):
            bp = f"{name}.decoder_blocks.{i}"
            for ln in ("norm1", "norm2"):
                sd[f"{bp}.{ln}.weight"] = RNG.normal(size=dec).astype(np.float32)
                sd[f"{bp}.{ln}.bias"] = RNG.normal(size=dec).astype(np.float32)
            if name == "vis_mae_decoder":
                sd[f"{bp}.attn.qkv.weight"] = RNG.normal(size=(3 * dec, dec)).astype(np.float32)
                sd[f"{bp}.attn.qkv.bias"] = RNG.normal(size=3 * dec).astype(np.float32)
                sd[f"{bp}.attn.proj.weight"] = RNG.normal(size=(dec, dec)).astype(np.float32)
                sd[f"{bp}.attn.proj.bias"] = RNG.normal(size=dec).astype(np.float32)
            else:
                sd[f"{bp}.attn.in_proj_weight"] = RNG.normal(size=(3 * dec, dec)).astype(np.float32)
                sd[f"{bp}.attn.in_proj_bias"] = RNG.normal(size=3 * dec).astype(np.float32)
                sd[f"{bp}.attn.out_proj.weight"] = RNG.normal(size=(dec, dec)).astype(np.float32)
                sd[f"{bp}.attn.out_proj.bias"] = RNG.normal(size=dec).astype(np.float32)
            sd[f"{bp}.mlp.fc1.weight"] = RNG.normal(size=(4 * dec, dec)).astype(np.float32)
            sd[f"{bp}.mlp.fc1.bias"] = RNG.normal(size=4 * dec).astype(np.float32)
            sd[f"{bp}.mlp.fc2.weight"] = RNG.normal(size=(dec, 4 * dec)).astype(np.float32)
            sd[f"{bp}.mlp.fc2.bias"] = RNG.normal(size=dec).astype(np.float32)
    return sd


def test_full_conversion_covers_every_param():
    """Every model parameter must be fed from the synthetic checkpoint —
    zero missing, zero unexpected."""
    _, init_params = init_segclip(TINY, seed=0)
    sd = _synth_reference_state_dict(TINY)
    converted = convert_state_dict(sd, TINY)

    messages = []
    merged = merge_params(init_params, converted, log_fn=messages.append)
    assert not messages, "\n".join(messages)

    # merged values actually come from the checkpoint
    conv1 = np.asarray(merged["clip"]["visual"]["conv1"])
    want = sd["visual.conv1.weight"].reshape(TINY.vision_width, -1).T
    np.testing.assert_array_equal(conv1, want)


def test_grouped_conv_conversion_matches_torch():
    w, g = 64, 4
    weight = RNG.normal(size=(w, w // g, 1)).astype(np.float32)
    x = RNG.normal(size=(2, 5, w)).astype(np.float32)

    conv = torch.nn.Conv1d(w, w, 1, groups=g, bias=False)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(weight))
    # torch convention: conv over (B, C, L)
    with torch.no_grad():
        want = conv(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()

    kernel = weight[..., 0].reshape(g, w // g, w // g).transpose(0, 2, 1)
    gl = GroupedLinear(w, g, compute_dtype=jnp.float32)
    got = gl.apply({"params": {"kernel": jnp.asarray(kernel)}},
                   jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_merge_reports_missing_for_partial_checkpoint():
    """A raw-CLIP-style checkpoint (no semantic learner / MAE weights) merges
    with those params kept random and reported missing."""
    _, init_params = init_segclip(TINY, seed=0)
    sd = _synth_reference_state_dict(TINY)
    # drop everything the raw OpenAI checkpoint wouldn't have
    sd = {k: v for k, v in sd.items()
          if "semantic_layer2" not in k and "mae_decoder" not in k
          and "layers_mae2" not in k and "reconstruct" not in k}
    converted = convert_state_dict(sd, TINY)
    messages = []
    merged = merge_params(init_params, converted, log_fn=messages.append)
    assert any("kept random" in m for m in messages)
    # pretrained weight landed
    np.testing.assert_array_equal(
        np.asarray(merged["clip"]["text_projection"]), sd["text_projection"])
    # random weight survived
    sl = merged["clip"]["visual"]["transformer"]["semantic_layer2"]
    assert np.asarray(sl["semantic_center"]).std() > 0


def test_export_roundtrip():
    """synthetic reference sd → flax params → exported sd: every tensor
    identical (covers all transposes and the grouped-conv reshape)."""
    from segclip_tpu.checkpoint.torch_export import export_state_dict
    _, init_params = init_segclip(TINY, seed=0)
    sd = _synth_reference_state_dict(TINY)
    converted = convert_state_dict(sd, TINY)
    merged = merge_params(init_params, converted)
    exported = export_state_dict(merged,
                                 vision_patch_size=TINY.vision_patch_size)
    surgered = {("clip." + k if not k.startswith(("vis_mae", "seq_mae"))
                 else k): v
                for k, v in __import__("segclip_tpu.checkpoint.torch_convert",
                                       fromlist=["apply_layer_surgery"]
                                       ).apply_layer_surgery(
                    sd, TINY.first_stage_layer).items()}
    missing = sorted(set(surgered) - set(exported))
    extra = sorted(set(exported) - set(surgered))
    assert not missing, missing[:8]
    assert not extra, extra[:8]
    for k in surgered:
        np.testing.assert_allclose(exported[k], surgered[k], atol=1e-6,
                                   err_msg=k)


def test_save_torch_checkpoint_loads_back(tmp_path):
    from segclip_tpu.checkpoint.torch_export import save_torch_checkpoint
    from segclip_tpu.checkpoint.torch_convert import load_torch_state_dict
    _, params = init_segclip(TINY, seed=0)
    path = str(tmp_path / "export.bin")
    save_torch_checkpoint(path, params,
                          vision_patch_size=TINY.vision_patch_size)
    sd = load_torch_state_dict(path)
    assert "clip.visual.conv1.weight" in sd
    assert sd["clip.visual.conv1.weight"].shape == (
        TINY.vision_width, 3, TINY.vision_patch_size, TINY.vision_patch_size)


def test_infer_model_config_segclip_format_counts_only_tower_blocks():
    """A SegCLIP-format dict contains cross_att / layers_mae2 attention
    weights which must NOT inflate vision_layers (regression: counting all
    visual.*.attn.in_proj_weight keys gave 16 layers for a 4-layer tower)."""
    sd = _synth_reference_state_dict(TINY)          # raw resblocks naming
    converted_names = apply_layer_surgery(sd, TINY.first_stage_layer)
    cfg = infer_model_config(converted_names,
                             first_stage_layer=TINY.first_stage_layer)
    assert cfg.vision_layers == TINY.vision_layers
    cfg2 = infer_model_config(sd, first_stage_layer=TINY.first_stage_layer)
    assert cfg2.vision_layers == TINY.vision_layers


VARIANT = ModelConfig(
    image_resolution=64, vision_patch_size=16, vision_width=128,
    vision_layers=5, first_stage_layer=4, group_num=6, cross_layer=2,
    context_length=20, vocab_size=300, transformer_width=64,
    transformer_layers=3, embed_dim=48, max_words=10,
    use_vision_mae_recon=True, use_text_mae_recon=True,
    mae_decoder_depth=2, mae_decoder_num_heads=2, compute_dtype="float32")


def test_variant_architecture_inference_and_conversion():
    """Shape inference + conversion generalize beyond the ViT-B/16 default
    (the reference builds any CLIP variant from checkpoint tensor shapes,
    modeling.py:89-109, and hardcodes the grouping config): a
    5-layer/128-wide variant with 6 groups and 2 cross layers is fully
    re-inferred from its own checkpoint — including group_num/cross_layer,
    which we infer from the semantic learner keys — and converts with zero
    missing/unexpected params."""
    sd = _synth_reference_state_dict(VARIANT)
    cfg = infer_model_config(
        sd, first_stage_layer=VARIANT.first_stage_layer,
        use_text_mae_recon=True, mae_decoder_depth=2,
        mae_decoder_num_heads=2, max_words=10, compute_dtype="float32")
    for field in ("image_resolution", "vision_patch_size", "vision_width",
                  "vision_layers", "group_num", "cross_layer",
                  "context_length", "vocab_size", "transformer_width",
                  "transformer_layers", "embed_dim"):
        assert getattr(cfg, field) == getattr(VARIANT, field), field

    _, init_params = init_segclip(cfg, seed=0)
    converted = convert_state_dict(sd, cfg)
    messages = []
    merged = merge_params(init_params, converted, log_fn=messages.append)
    assert not messages, "\n".join(messages)
    center = np.asarray(
        merged["clip"]["visual"]["transformer"]["semantic_layer2"]
        ["semantic_center"])
    np.testing.assert_array_equal(
        center, sd["visual.transformer.semantic_layer2.semantic_center"])


def test_infer_first_stage_layer_from_split_checkpoint():
    """An already-split SegCLIP dict (layers0.*/layers2.*) carries its
    two-stage split point as the layers0 block count — it must win over the
    caller's default so a non-default split (e.g. 22/2 ViT-L) loads without
    manual config; pre-surgery resblocks dicts keep the caller's value."""
    sd = _synth_reference_state_dict(VARIANT)       # resblocks naming
    pre = infer_model_config(sd, first_stage_layer=VARIANT.first_stage_layer)
    assert pre.first_stage_layer == VARIANT.first_stage_layer
    split = apply_layer_surgery(sd, VARIANT.first_stage_layer)
    # caller passes the WRONG default (10): the checkpoint's 4/1 split wins
    cfg = infer_model_config(split, first_stage_layer=10)
    assert cfg.first_stage_layer == VARIANT.first_stage_layer
