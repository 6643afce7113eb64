"""Sharding + distributed train-step tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.parallel.mesh import create_mesh
from vis_zephyr_tpu.parallel.sharding import (
    batch_spec,
    param_specs,
    shard_batch,
    shard_params,
)
from vis_zephyr_tpu.train.optimizer import OptimizerConfig, build_optimizer, trainable_mask
from vis_zephyr_tpu.train.steps import init_train_state, loss_fn, make_train_step


requires_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    return cfg, params


def make_batch(cfg, rng, B=8, T=6, P=3):
    H = cfg.vision.image_size
    ids = rng.integers(5, cfg.decoder.vocab_size, (B, T))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    return {
        "input_ids": jnp.asarray(ids),
        "images": jnp.asarray(rng.standard_normal((B, P, H, H, 3)), jnp.float32),
        "patch_valid": jnp.ones((B, P), bool),
        "labels": jnp.asarray(rng.integers(5, cfg.decoder.vocab_size, (B, T))),
    }


class TestShardingSpecs:
    def test_decoder_attn_specs(self, setup):
        cfg, params = setup
        mesh = create_mesh(data=1, fsdp=2, model=4)
        specs = param_specs(params, mesh)
        assert specs["decoder"]["layers"]["attn"]["q"]["kernel"] == P(None, "fsdp", "model")
        assert specs["decoder"]["layers"]["attn"]["out"]["kernel"] == P(None, "model", "fsdp")
        assert specs["decoder"]["layers"]["mlp"]["down"]["kernel"] == P(None, "model", "fsdp")

    def test_indivisible_dims_replicate(self, setup):
        cfg, params = setup
        mesh = create_mesh(data=1, fsdp=1, model=8)
        specs = param_specs(params, mesh)
        # tiny decoder: qkv output dim = 64, divisible by 8 → sharded.
        assert specs["decoder"]["layers"]["attn"]["q"]["kernel"][2] == "model"
        # head-dim-16 tensors etc. that don't divide degrade to None — spot
        # check the rule machinery with an artificial odd shape.
        from vis_zephyr_tpu.parallel.sharding import spec_for

        assert spec_for("decoder/layers/attn/q/kernel", (2, 7, 9), mesh) == P(None, None, None)

    def test_batch_spec(self):
        mesh = create_mesh(data=2, fsdp=4, model=1)
        assert batch_spec(mesh) == P(("data", "fsdp"))

    def test_projector_and_vision_rules(self, setup):
        cfg, params = setup
        mesh = create_mesh(data=1, fsdp=2, model=4)
        specs = param_specs(params, mesh)
        assert specs["projector"]["blocks"]["cross_attn"]["k"]["kernel"] == P(None, "fsdp", "model")
        assert specs["projector"]["blocks"]["fc2"]["kernel"] == P(None, "model", "fsdp")
        assert specs["projector"]["queries"] == P(None, None)
        assert specs["vision"]["layers"]["fc1"]["kernel"] == P(None, "fsdp", "model")
        # Norm scales replicate.
        assert specs["decoder"]["layers"]["input_ln"]["scale"] == P(None, None)

    def test_quantized_fused_kernels_get_specs(self, setup):
        from vis_zephyr_tpu.models.mistral import fuse_decoder_layers
        from vis_zephyr_tpu.ops.quant import quantize_decoder_layers

        cfg, params = setup
        mesh = create_mesh(data=1, fsdp=2, model=4)
        qp = {"decoder": fuse_decoder_layers(quantize_decoder_layers(params["decoder"]))}
        specs = param_specs(qp, mesh)
        assert specs["decoder"]["layers"]["attn"]["qkv"]["kernel_q"] == P(None, "fsdp", "model")
        assert specs["decoder"]["layers"]["mlp"]["gate_up"]["kernel_q"] == P(None, "fsdp", "model")


@requires_8
class TestDistributedTrainStep:
    def test_fsdp_step_matches_single_device(self, setup, rng):
        cfg, params = setup
        batch = make_batch(cfg, rng)
        opt_cfg = OptimizerConfig(total_steps=10, learning_rate=1e-3, projector_lr=1e-2)
        tx = build_optimizer(params, opt_cfg, stage="1")
        step = make_train_step(cfg, tx, remat=True)

        # Single-device reference.
        state0 = init_train_state(params, tx)
        state1, metrics1 = jax.jit(step)(state0, batch)

        # 8-way fsdp.
        mesh = create_mesh(data=1, fsdp=8, model=1)
        with jax.set_mesh(mesh):
            sharded_params = shard_params(params, mesh)
            sharded_batch = shard_batch(batch, mesh)
            state_s = init_train_state(sharded_params, tx)
            state_s, metrics_s = jax.jit(step)(state_s, sharded_batch)

        np.testing.assert_allclose(
            float(metrics1["loss"]), float(metrics_s["loss"]), rtol=1e-5
        )
        # Updated projector params must match.
        a = np.asarray(state1["params"]["projector"]["queries"])
        b = np.asarray(jax.device_get(state_s["params"]["projector"]["queries"]))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_tp_forward_matches_single_device(self, setup, rng):
        cfg, params = setup
        batch = make_batch(cfg, rng, B=2)
        loss_ref, _ = loss_fn(params, batch, cfg, remat=False)

        mesh = create_mesh(data=1, fsdp=1, model=8)
        with jax.set_mesh(mesh):
            sp = shard_params(params, mesh)
            loss_tp, _ = jax.jit(lambda p, b: loss_fn(p, b, cfg, remat=False))(sp, batch)
        np.testing.assert_allclose(float(loss_ref), float(loss_tp), rtol=1e-5)


class TestStageFreezing:
    def test_stage1_only_projector_updates(self, setup, rng):
        cfg, params = setup
        batch = make_batch(cfg, rng, B=2)
        tx = build_optimizer(params, OptimizerConfig(total_steps=10), stage="1")
        step = make_train_step(cfg, tx, remat=False)
        state = init_train_state(params, tx)
        new_state, _ = jax.jit(step)(state, batch)

        # Projector changed.
        assert not np.allclose(
            np.asarray(new_state["params"]["projector"]["queries"]),
            np.asarray(params["projector"]["queries"]),
        )
        # Decoder + vision unchanged.
        for branch in ("decoder", "vision"):
            before = jax.tree_util.tree_leaves(params[branch])
            after = jax.tree_util.tree_leaves(new_state["params"][branch])
            for x, y in zip(before, after):
                np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_stage2_freezes_projector_and_tower(self, setup):
        cfg, params = setup
        mask = trainable_mask(params, stage="2")
        assert not any(jax.tree_util.tree_leaves(mask["projector"]))
        assert not any(jax.tree_util.tree_leaves(mask["vision"]))
        assert all(jax.tree_util.tree_leaves(mask["decoder"]))
