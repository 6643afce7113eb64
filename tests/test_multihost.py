"""Multi-host (DCN) training: two REAL processes, each with 4 virtual CPU
devices, form a dcn=2 × fsdp=2 × model=2 global mesh and run one training
step with per-process (elastic) data loading.

Replaces the reference's multi-node DeepSpeed/NCCL layout (SURVEY §2.2);
here the cross-host axis is pure data parallelism and XLA emits the DCN
gradient all-reduce from the shardings.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")

from vis_zephyr_tpu.parallel import distributed
assert distributed.ensure_initialized(), "distributed init did not trigger"
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

import numpy as np
import jax.numpy as jnp
from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.parallel.mesh import create_multihost_mesh
from vis_zephyr_tpu.parallel.sharding import shard_params
from vis_zephyr_tpu.train.optimizer import OptimizerConfig, build_optimizer, trainable_mask
from vis_zephyr_tpu.train.steps import init_train_state, make_train_step

cfg = tiny_config()
mesh = create_multihost_mesh(dcn=2, data=1, fsdp=2, model=2)
assert dict(mesh.shape) == {"dcn": 2, "data": 1, "fsdp": 2, "model": 2}

params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
opt = OptimizerConfig(total_steps=4, learning_rate=1e-4, projector_lr=1e-3)
tx = build_optimizer(params, opt, stage="1")
train_step = jax.jit(make_train_step(cfg, tx, remat=False,
                                     trainable=trainable_mask(params, "1")))

GLOBAL_B, T, P = 4, 16, 4
rng = np.random.default_rng(0)  # SAME data on both ranks; slices differ
ids = rng.integers(5, cfg.decoder.vocab_size, (GLOBAL_B, T))
ids[:, 1] = IMAGE_TOKEN_INDEX
full = {
    "input_ids": ids,
    "images": rng.standard_normal(
        (GLOBAL_B, P, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32),
    "patch_valid": np.ones((GLOBAL_B, P), bool),
    "labels": rng.integers(5, cfg.decoder.vocab_size, (GLOBAL_B, T)),
}
sl = distributed.process_batch_slice(GLOBAL_B)
local = {k: v[sl] for k, v in full.items()}

with jax.set_mesh(mesh):
    sharded = shard_params(params, mesh)
    batch = distributed.make_global_batch(local, mesh)
    state = init_train_state(sharded, tx)
    state, metrics = train_step(state, batch)
    loss = float(jax.device_get(metrics["loss"]))
assert np.isfinite(loss), loss
print(f"RANK{jax.process_index()} loss={loss:.6f}", flush=True)
"""


@pytest.mark.skipif(
    os.environ.get("VZT_SKIP_MULTIHOST") == "1", reason="explicitly disabled"
)
def test_two_process_dcn_train_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            VZT_COORDINATOR=f"127.0.0.1:{port}",
            VZT_NUM_PROCESSES="2",
            VZT_PROCESS_ID=str(rank),
            PYTHONPATH=repo + os.pathsep + os.environ.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env, cwd=repo,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed rc={rc}\n{err[-3000:]}"
    losses = sorted(
        line for rc, out, _ in outs for line in out.splitlines() if "loss=" in line
    )
    assert len(losses) == 2, losses
    # Both ranks observe the same global loss (one SPMD program).
    l0 = losses[0].split("loss=")[1]
    l1 = losses[1].split("loss=")[1]
    assert l0 == l1, losses
