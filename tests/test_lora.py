"""LoRA adapter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.mistral import embed, mistral_forward
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.train.lora import (
    LoraConfig,
    add_lora,
    attach_lora,
    lora_trainable_mask,
    merge_lora,
    split_lora,
)
from vis_zephyr_tpu.train.optimizer import OptimizerConfig, build_optimizer, trainable_mask
from vis_zephyr_tpu.train.steps import init_train_state, make_train_step


CFG = tiny_config()
LORA = LoraConfig(r=4, alpha=8)


@pytest.fixture(scope="module")
def lora_params():
    params = init_vis_zephyr(CFG, jax.random.PRNGKey(0))
    return params, add_lora(params, LORA, jax.random.PRNGKey(1))


class TestLoraStructure:
    def test_targets_decoder_linears_only(self, lora_params):
        _, lp = lora_params
        attn = lp["decoder"]["layers"]["attn"]["q"]
        assert "lora_a" in attn and attn["lora_a"].shape[-1] == LORA.r
        assert float(jnp.abs(attn["lora_b"]).max()) == 0.0
        assert "lora_a" not in lp["projector"]["blocks"]["fc1"]
        assert "lora_a" not in lp["decoder"]["lm_head"]
        assert "lora_a" not in lp["vision"]["layers"]["fc1"]

    def test_zero_init_preserves_forward(self, lora_params, rng):
        params, lp = lora_params
        ids = jnp.asarray(rng.integers(5, CFG.decoder.vocab_size, (1, 6)))
        pos = jnp.arange(6)[None]
        base, _ = mistral_forward(params["decoder"], embed(params["decoder"], ids), CFG.decoder, pos)
        wrapped, _ = mistral_forward(lp["decoder"], embed(lp["decoder"], ids), CFG.decoder, pos)
        np.testing.assert_allclose(np.asarray(base), np.asarray(wrapped), rtol=1e-6)

    def test_merge_matches_unmerged(self, lora_params, rng):
        _, lp = lora_params
        # Perturb B so the adapters do something.
        lp = jax.tree_util.tree_map(lambda x: x, lp)
        q = lp["decoder"]["layers"]["attn"]["q"]
        q["lora_b"] = jnp.ones_like(q["lora_b"]) * 0.01

        ids = jnp.asarray(rng.integers(5, CFG.decoder.vocab_size, (1, 5)))
        pos = jnp.arange(5)[None]
        live, _ = mistral_forward(lp["decoder"], embed(lp["decoder"], ids), CFG.decoder, pos)
        merged = merge_lora(lp)
        assert "lora_a" not in merged["decoder"]["layers"]["attn"]["q"]
        folded, _ = mistral_forward(
            merged["decoder"], embed(merged["decoder"], ids), CFG.decoder, pos
        )
        np.testing.assert_allclose(np.asarray(live), np.asarray(folded), rtol=2e-5, atol=2e-5)

    def test_split_attach_roundtrip(self, lora_params):
        _, lp = lora_params
        base, adapters = split_lora(lp)
        assert adapters and all("lora_a" in v for v in adapters.values())
        assert "lora_a" not in base["decoder"]["layers"]["attn"]["q"]
        back = attach_lora(base, adapters)
        assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(lp)


class TestLoraTraining:
    def test_stage2_trains_only_adapters(self, lora_params, rng):
        _, lp = lora_params
        mask = trainable_mask(lp, stage="2")
        flat = jax.tree_util.tree_leaves_with_path(mask)
        for path, trainable in flat:
            leaf = str(getattr(path[-1], "key", ""))
            assert trainable == (leaf in ("lora_a", "lora_b"))

        tx = build_optimizer(lp, OptimizerConfig(total_steps=4, learning_rate=1e-2), stage="2")
        step = make_train_step(CFG, tx, remat=False)
        H = CFG.vision.image_size
        ids = rng.integers(5, CFG.decoder.vocab_size, (2, 6))
        ids[:, 1] = IMAGE_TOKEN_INDEX
        batch = {
            "input_ids": jnp.asarray(ids),
            "images": jnp.asarray(rng.standard_normal((2, 3, H, H, 3)), jnp.float32),
            "patch_valid": jnp.ones((2, 3), bool),
            "labels": jnp.asarray(rng.integers(5, CFG.decoder.vocab_size, (2, 6))),
        }
        state = init_train_state(lp, tx)
        new_state, metrics = jax.jit(step)(state, batch)
        assert np.isfinite(float(metrics["loss"]))

        q_old = lp["decoder"]["layers"]["attn"]["q"]
        q_new = new_state["params"]["decoder"]["layers"]["attn"]["q"]
        np.testing.assert_array_equal(np.asarray(q_old["kernel"]), np.asarray(q_new["kernel"]))
        # At step 1 grad(lora_a) is exactly zero (B starts at zero), so the
        # adapter signal shows up in lora_b first.
        assert not np.allclose(np.asarray(q_old["lora_b"]), np.asarray(q_new["lora_b"]))
        np.testing.assert_array_equal(
            np.asarray(lp["projector"]["queries"]),
            np.asarray(new_state["params"]["projector"]["queries"]),
        )


class TestLoraDropout:
    """Reference recipe: peft lora_dropout=0.05 (`script/finetune.sh`) —
    train-time dropout on the LoRA branch input only."""

    def _loss(self, params, batch, lora_dropout=0.0, rng=None):
        from vis_zephyr_tpu.train.steps import loss_fn

        loss, _ = loss_fn(params, batch, CFG, remat=False,
                          lora_dropout=lora_dropout, dropout_rng=rng)
        return float(loss)

    def _batch(self, rng):
        ids = rng.integers(5, CFG.decoder.vocab_size, (2, 6))
        return {
            "input_ids": jnp.asarray(ids),
            "labels": jnp.asarray(rng.integers(5, CFG.decoder.vocab_size, (2, 6))),
        }

    def test_dropout_changes_training_loss(self, lora_params, rng):
        _, lp = lora_params
        # Nonzero B so the LoRA branch contributes (fresh adapters have B=0).
        lp = jax.tree_util.tree_map(lambda x: x, lp)

        def bump(node):
            if isinstance(node, dict) and "lora_b" in node:
                node = dict(node)
                node["lora_b"] = jnp.ones_like(node["lora_b"]) * 0.3
                return node
            if isinstance(node, dict):
                return {k: bump(v) for k, v in node.items()}
            return node

        lp = bump(lp)
        batch = self._batch(rng)
        base = self._loss(lp, batch)
        same = self._loss(lp, batch, lora_dropout=0.0, rng=jax.random.PRNGKey(3))
        assert base == same  # rate 0 → rng ignored
        dropped = self._loss(lp, batch, lora_dropout=0.5, rng=jax.random.PRNGKey(3))
        assert dropped != base
        # No rng (inference) → dropout inactive even with a rate set.
        eval_loss = self._loss(lp, batch, lora_dropout=0.5, rng=None)
        assert eval_loss == base
        # Different rng → different mask → different loss.
        dropped2 = self._loss(lp, batch, lora_dropout=0.5, rng=jax.random.PRNGKey(4))
        assert dropped2 != dropped

    def test_dropout_noop_without_adapters(self, lora_params, rng):
        base_params, _ = lora_params
        batch = self._batch(rng)
        a = self._loss(base_params, batch)
        b = self._loss(base_params, batch, lora_dropout=0.5, rng=jax.random.PRNGKey(0))
        assert a == b
