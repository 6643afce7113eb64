"""Stage-1 pretrain on the reference's own 2-sample fixture — the
reference's de-facto integration test (SURVEY §4: `pretrain.sh` defaults to
this dataset). Exercises the plain conversation template, real JPEG images,
the anyres pipeline, and a distributed train step."""

import os

import numpy as np
import pytest

import jax

from vis_zephyr_tpu.config import tiny_config
from vis_zephyr_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.conversation import templates
from vis_zephyr_tpu.data.dataset import Collator, DataConfig, SupervisedDataset
from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
from vis_zephyr_tpu.train.optimizer import OptimizerConfig, build_optimizer
from vis_zephyr_tpu.train.steps import init_train_state, make_train_step

DATA = "/root/reference/playground/data/pretrain/test.json"
IMAGES = "/root/reference/playground/data/pretrain/images"

pytestmark = pytest.mark.skipif(not os.path.exists(DATA), reason="reference fixture unavailable")


@pytest.fixture(scope="module")
def dataset(mock_tokenizer_mod):
    cfg = tiny_config(vocab_size=50000)
    dc = DataConfig(
        data_path=DATA,
        image_folder=IMAGES,
        image_aspect_ratio="anyres",
        mm_grid_pinpoints=cfg.mm_grid_pinpoints,
        image_size=cfg.vision.image_size,
        conv=templates["plain"],
    )
    return cfg, SupervisedDataset(dc, mock_tokenizer_mod)


@pytest.fixture(scope="module")
def mock_tokenizer_mod():
    from conftest import MockTokenizer

    return MockTokenizer()


def test_pretrain_samples(dataset):
    cfg, ds = dataset
    assert len(ds) == 2
    for i in range(2):
        s = ds[i]
        ids, labels = s["input_ids"], s["labels"]
        # Plain template: <image> + caption; the image prefix is masked,
        # the caption supervised.
        assert (ids == IMAGE_TOKEN_INDEX).sum() == 1
        assert np.argmax(ids == IMAGE_TOKEN_INDEX) == 1  # right after BOS
        supervised = labels != IGNORE_INDEX
        assert supervised.any()
        assert s["patch_valid"].any()
        assert s["images"].shape[1:] == (cfg.vision.image_size, cfg.vision.image_size, 3)


def test_pretrain_step_runs(dataset, rng):
    cfg, ds = dataset
    collate = Collator(pad_token_id=cfg.decoder.pad_token_id, max_length=256, pad_multiple=32)
    batch = collate([ds[0], ds[1]])
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    tx = build_optimizer(params, OptimizerConfig(total_steps=3, projector_lr=1e-2), stage="1")
    step = make_train_step(cfg, tx, remat=True)
    state = init_train_state(params, tx)
    import jax.numpy as jnp

    state, metrics = jax.jit(step)(state, {k: jnp.asarray(v) for k, v in batch.items()})
    loss = float(jax.device_get(metrics["loss"]))
    assert np.isfinite(loss) and loss > 0
