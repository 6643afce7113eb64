"""Checkpoint save/restore round-trips."""

import jax
import jax.numpy as jnp
import numpy as np

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.train.checkpoints import (
    checkpoint_meta,
    latest_checkpoint,
    load_checkpoint,
    load_projector,
    save_checkpoint,
)
from vis_zephyr_tpu.train.optimizer import OptimizerConfig, build_optimizer
from vis_zephyr_tpu.train.steps import init_train_state


def test_full_state_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(params, OptimizerConfig(total_steps=5), stage="1")
    state = init_train_state(params, tx)

    path = save_checkpoint(str(tmp_path), state, step=3)
    assert latest_checkpoint(str(tmp_path)) == path
    assert checkpoint_meta(path)["step"] == 3

    fresh = init_train_state(init_vis_zephyr(cfg, jax.random.PRNGKey(1)), tx)
    restored = load_checkpoint(path, fresh)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["projector"]["queries"]),
        np.asarray(params["projector"]["queries"]),
    )


def test_projector_only_roundtrip(tmp_path):
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    state = {"params": params, "opt_state": (), "step": jnp.zeros((), jnp.int32)}
    path = save_checkpoint(str(tmp_path), state, step=1, projector_only=True)
    assert checkpoint_meta(path)["projector_only"]

    other = init_vis_zephyr(cfg, jax.random.PRNGKey(9))
    restored = load_projector(path, other["projector"])
    np.testing.assert_array_equal(
        np.asarray(restored["queries"]), np.asarray(params["projector"]["queries"])
    )
    # Only the projector dir exists — no full-state payload.
    import os

    assert not os.path.isdir(os.path.join(path, "state"))


def test_latest_checkpoint_ordering(tmp_path):
    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    state = {"params": params, "opt_state": (), "step": jnp.zeros((), jnp.int32)}
    save_checkpoint(str(tmp_path), state, step=2, projector_only=True)
    p10 = save_checkpoint(str(tmp_path), state, step=10, projector_only=True)
    assert latest_checkpoint(str(tmp_path)) == p10
    assert latest_checkpoint(str(tmp_path / "nope")) is None
