"""Worker process for the 2-process × 4-device CPU distributed test.

Run as:  python tests/multihost_worker.py <process_id> <port> <out_json>

Simulates a real multi-host launch: each process owns 4 CPU devices, joins
the cluster via jax.distributed.initialize (gloo collectives), builds the
GLOBAL 8-device mesh, feeds its own half of a fixed global batch through
the sharded train step, and participates in the host-0 eval broadcast —
the flow a multi-host pod run of cli/train.py performs.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    process_id = int(sys.argv[1])
    port = int(sys.argv[2])
    out_json = sys.argv[3]

    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from segclip_tpu.utils.jax_setup import maybe_initialize_distributed
    assert maybe_initialize_distributed(
        coordinator=f"localhost:{port}", num_processes=2,
        process_id=process_id)

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    from segclip_tpu.config import Config, ModelConfig, OptimConfig
    from segclip_tpu.models.segclip import init_segclip
    from segclip_tpu.parallel.mesh import make_mesh, shard_batch
    from segclip_tpu.train.step import (create_train_state,
                                        make_sharded_train_step)

    tiny = ModelConfig(
        image_resolution=32, vision_patch_size=8, vision_width=64,
        vision_layers=4, first_stage_layer=3, group_num=4, cross_layer=1,
        context_length=16, vocab_size=512, transformer_width=64,
        transformer_layers=2, embed_dim=32, max_words=12,
        use_vision_mae_recon=True, use_text_mae_recon=False,
        use_seglabel=True, mae_decoder_depth=1, mae_decoder_num_heads=2,
        compute_dtype="float32")
    cfg = Config(model=tiny, optim=OptimConfig(lr=1e-3, lower_lr=1e-4))

    # the same fixed global batch every process derives (seed-determined)
    rng = np.random.default_rng(5)
    B = 16
    ids = np.zeros((B, tiny.max_words), np.int32)
    ids[:, 0] = 510
    ids[:, 1:4] = rng.integers(1, 500, size=(B, 3))
    ids[:, 4] = 511
    global_batch = {
        "input_ids": ids,
        "attention_mask": (ids != 0).astype(np.int32),
        "image": rng.normal(size=(B, 32, 32, 3)).astype(np.float32),
        "image_seg": rng.integers(0, 3, size=(B, 4, 4)).astype(np.int32),
    }
    # this process's contiguous half (ShardedEpochSampler layout)
    lo, hi = process_id * (B // 2), (process_id + 1) * (B // 2)
    local_batch = {k: v[lo:hi] for k, v in global_batch.items()}

    model, params = init_segclip(tiny, seed=0)
    state, tx, trainable = create_train_state(cfg, params, t_total=50,
                                              seed=1)
    mesh = make_mesh()            # global: 2 processes × 4 devices
    step = make_sharded_train_step(mesh, model, tx, trainable=trainable)

    losses = []
    for _ in range(3):
        state, metrics = step(state, shard_batch(mesh, local_batch))
        losses.append(float(metrics["loss"]))

    # host-0 eval + scalar broadcast (train/loop.py per-epoch flow).
    # The eval itself exercises the real failure mode: post-step params are
    # global multi-process arrays, unusable from a single-process jit —
    # loop.py fetches host-local replicas first; reproduce that here and
    # prove the fetched params drive a local jit.
    from jax.experimental import multihost_utils
    miou = float("nan")
    if jax.process_index() == 0:
        eval_params = jax.tree.map(
            lambda x: np.asarray(x.addressable_shards[0].data), state.params)

        def eval_forward(params, image):
            return model.apply(
                {"params": params}, image,
                method=lambda m, im: m.encode_image(im,
                                                    training=False)).pooled

        pooled = jax.jit(eval_forward)(
            eval_params, jnp.zeros((1, 32, 32, 3), jnp.float32))
        assert np.all(np.isfinite(np.asarray(pooled))), "local eval forward"
        miou = 42.5
    miou = float(multihost_utils.broadcast_one_to_all(
        np.asarray(miou, np.float32)))

    # cross-host mIoU-meter reduction (evalseg distributed eval): each
    # process scores a different half; the reduced meter must equal a
    # single meter fed both halves.
    from segclip_tpu.evalseg.miou import MIoUMeter
    rng2 = np.random.default_rng(9)
    preds = rng2.integers(0, 5, size=(2, 20, 20))
    labels = rng2.integers(0, 5, size=(2, 20, 20))
    local = MIoUMeter(5)
    local.update(preds[process_id], labels[process_id])
    local.set_state(np.asarray(
        multihost_utils.process_allgather(local.state())).sum(axis=0))
    combined = MIoUMeter(5)
    combined.update(preds[0], labels[0])
    combined.update(preds[1], labels[1])
    assert np.allclose(local.state(), combined.state()), "meter reduction"
    reduced_miou = local.results()["mIoU"]

    # --- GSPMD dp×tp across BOTH processes (train.tensor_parallelism) ----
    # dp4×tp2 over the 8 global devices: Megatron-sharded params span the
    # two processes; batches assemble via make_array_from_process_local_data
    # and fetch_replicated all-gathers the TP shards back (the per-epoch
    # eval path of train/loop.py under multi-host TP).
    from segclip_tpu.parallel.gspmd import (fetch_replicated, make_dp_tp_mesh,
                                            make_gspmd_train_step)
    model_tp, params_tp = init_segclip(tiny, seed=0)
    state_tp, tx_tp, trainable_tp = create_train_state(cfg, params_tp,
                                                       t_total=50, seed=1)
    mesh_tp = make_dp_tp_mesh(4, 2)
    step_tp, place_state, place_batch = make_gspmd_train_step(
        mesh_tp, model_tp, tx_tp, state_tp, trainable=trainable_tp)
    state_tp = place_state(state_tp)
    tp_losses = []
    for _ in range(2):
        state_tp, m_tp = step_tp(state_tp, place_batch(local_batch))
        tp_losses.append(float(m_tp["loss"]))
    fetched = fetch_replicated(state_tp.params, mesh_tp)
    tp_param_sum = float(np.sum(np.abs(
        fetched["clip"]["visual"]["proj"])))

    with open(out_json, "w") as f:
        json.dump({"process_id": process_id, "losses": losses,
                   "miou": miou, "reduced_miou": reduced_miou,
                   "tp_losses": tp_losses, "tp_param_sum": tp_param_sum,
                   "process_count": jax.process_count()}, f)


if __name__ == "__main__":
    main()
