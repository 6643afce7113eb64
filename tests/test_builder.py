"""load_pretrained_model interop tests: HF-style weight dirs + mm_projector.bin."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vis_zephyr_tpu.config import (  # noqa: E402
    DecoderConfig,
    ProjectorConfig,
    VisionConfig,
    VisZephyrConfig,
)
from vis_zephyr_tpu.models.builder import load_pretrained_model  # noqa: E402

from test_mistral_parity import make_torch_mistral  # noqa: E402
from test_vision_parity import TINY_PROJ, TINY_VISION, TorchQFormer, make_torch_clip  # noqa: E402

TINY_DEC = DecoderConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=3,
    num_heads=4, num_kv_heads=2, head_dim=16, sliding_window=None,
)


@pytest.fixture
def hf_dirs(tmp_path):
    base = tmp_path / "zephyr"
    base.mkdir()
    mistral = make_torch_mistral(TINY_DEC)
    torch.save(mistral.state_dict(), base / "pytorch_model.bin")

    tower = tmp_path / "clip"
    tower.mkdir()
    clip = make_torch_clip(TINY_VISION)
    torch.save(clip.state_dict(), tower / "pytorch_model.bin")

    model = tmp_path / "vis-zephyr"
    model.mkdir()
    qf = TorchQFormer(TINY_PROJ)
    torch.save(
        {f"model.mm_projector.{k}": v for k, v in qf.state_dict().items()},
        model / "mm_projector.bin",
    )
    cfg = VisZephyrConfig(vision=TINY_VISION, projector=TINY_PROJ, decoder=TINY_DEC)
    (model / "config.json").write_text(cfg.to_json())
    return str(model), str(base), str(tower), mistral, clip, qf


def test_hf_conversion_path(hf_dirs):
    model_dir, base_dir, tower_dir, mistral, clip, qf = hf_dirs
    tokenizer, params, cfg, ctx = load_pretrained_model(
        model_dir, model_base=base_dir, vision_tower_path=tower_dir, dtype=jnp.float32
    )
    assert set(params) == {"decoder", "vision", "projector"}
    assert ctx == cfg.tokenizer_model_max_length

    # Spot-check weight round trips.
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["embed_tokens"]),
        mistral.state_dict()["model.embed_tokens.weight"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["projector"]["queries"]),
        qf.state_dict()["learned_queries"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["vision"]["pre_ln"]["scale"]),
        clip.state_dict()["vision_model.pre_layrnorm.weight"].numpy(),
        rtol=1e-6,
    )


def test_load_8bit_quantizes_decoder(hf_dirs):
    model_dir, base_dir, tower_dir, *_ = hf_dirs
    _, params, _, _ = load_pretrained_model(
        model_dir, model_base=base_dir, vision_tower_path=tower_dir,
        load_8bit=True, dtype=jnp.float32,
    )
    assert "kernel_q" in params["decoder"]["layers"]["attn"]["q"]
    assert params["decoder"]["layers"]["attn"]["q"]["kernel_q"].dtype == jnp.int8


def test_missing_everything_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_pretrained_model(str(tmp_path))
