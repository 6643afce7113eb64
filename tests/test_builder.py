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


def test_native_lora_state_merges_on_load(tmp_path):
    """Stage-2 native artifact round-trip: a checkpoint whose params carry
    LoRA adapters loads as a merged, servable model
    (reference merge_and_unload, `model/builder.py:90-95`)."""
    import jax

    from vis_zephyr_tpu.config import tiny_config
    from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr
    from vis_zephyr_tpu.train.checkpoints import save_checkpoint
    from vis_zephyr_tpu.train.lora import LoraConfig, add_lora, merge_lora

    cfg = tiny_config()
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    params = add_lora(params, LoraConfig(r=4, alpha=8), jax.random.PRNGKey(1))
    # Non-zero B so the merge visibly changes the kernels.
    params["decoder"]["layers"]["attn"]["q"]["lora_b"] = (
        jax.random.normal(jax.random.PRNGKey(2),
                          params["decoder"]["layers"]["attn"]["q"]["lora_b"].shape) * 0.1
    )

    out = tmp_path / "stage2"
    p = save_checkpoint(str(out / "ckpts"), {"params": params}, step=1)
    os.rename(os.path.join(p, "state"), out / "state")
    (out / "config.json").write_text(tiny_config().to_json())

    _, loaded, _, _ = load_pretrained_model(str(out), dtype=jnp.float32)
    expected = merge_lora(params)
    leaf = loaded["decoder"]["layers"]["attn"]["q"]
    assert "lora_a" not in leaf  # merged, not raw
    np.testing.assert_allclose(
        np.asarray(leaf["kernel"]),
        np.asarray(expected["decoder"]["layers"]["attn"]["q"]["kernel"]),
        rtol=1e-5, atol=1e-6,
    )


def test_peft_lora_artifact_load(tmp_path, hf_dirs):
    """The reference's stage-2 format: HF base + adapter_model.bin +
    non_lora_trainables.bin (`vis_zephyr/model/builder.py:53-95`)."""
    _, base_dir, _, mistral, _, qf = hf_dirs

    art = tmp_path / "lora-artifact"
    art.mkdir()
    r, alpha = 4, 8.0
    (art / "adapter_config.json").write_text(json.dumps({"r": r, "lora_alpha": alpha}))
    gen = torch.Generator().manual_seed(0)
    asd = {}
    modules = {
        "self_attn.q_proj": (TINY_DEC.hidden_size, TINY_DEC.num_heads * TINY_DEC.head_dim),
        "self_attn.k_proj": (TINY_DEC.hidden_size, TINY_DEC.num_kv_heads * TINY_DEC.head_dim),
        "self_attn.v_proj": (TINY_DEC.hidden_size, TINY_DEC.num_kv_heads * TINY_DEC.head_dim),
        "self_attn.o_proj": (TINY_DEC.num_heads * TINY_DEC.head_dim, TINY_DEC.hidden_size),
        "mlp.gate_proj": (TINY_DEC.hidden_size, TINY_DEC.intermediate_size),
        "mlp.up_proj": (TINY_DEC.hidden_size, TINY_DEC.intermediate_size),
        "mlp.down_proj": (TINY_DEC.intermediate_size, TINY_DEC.hidden_size),
    }
    for i in range(TINY_DEC.num_layers):
        for mod, (din, dout) in modules.items():
            pre = f"base_model.model.model.layers.{i}.{mod}"
            asd[f"{pre}.lora_A.weight"] = torch.randn(r, din, generator=gen) * 0.1
            asd[f"{pre}.lora_B.weight"] = torch.randn(dout, r, generator=gen) * 0.1
    torch.save(asd, art / "adapter_model.bin")
    torch.save(
        {f"base_model.model.model.mm_projector.{k}": v for k, v in qf.state_dict().items()},
        art / "non_lora_trainables.bin",
    )
    cfg = VisZephyrConfig(vision=TINY_VISION, projector=TINY_PROJ, decoder=TINY_DEC)
    (art / "config.json").write_text(cfg.to_json())

    _, params, _, _ = load_pretrained_model(
        str(art), model_base=base_dir, dtype=jnp.float32
    )
    assert "projector" in params  # from non_lora_trainables
    leaf = params["decoder"]["layers"]["attn"]["q"]
    assert "lora_a" not in leaf

    # Check the merge math on layer 0's q kernel.
    base = mistral.state_dict()["model.layers.0.self_attn.q_proj.weight"].numpy().T
    A = asd["base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight"].numpy()
    B = asd["base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight"].numpy()
    expected = base + (A.T @ B.T) * (alpha / r)
    np.testing.assert_allclose(
        np.asarray(leaf["kernel"][0]), expected, rtol=1e-4, atol=1e-5
    )


def test_consolidated_single_dir_load(tmp_path, hf_dirs):
    """Full VisZephyr weights in one dir with no model_base
    (reference `builder.py:123-129`)."""
    _, _, _, mistral, clip, qf = hf_dirs
    cons = tmp_path / "consolidated"
    cons.mkdir()
    sd = dict(mistral.state_dict())
    sd.update({f"model.mm_projector.{k}": v for k, v in qf.state_dict().items()})
    sd.update({f"model.vision_tower.vision_tower.{k}": v for k, v in clip.state_dict().items()})
    torch.save(sd, cons / "pytorch_model.bin")
    cfg = VisZephyrConfig(vision=TINY_VISION, projector=TINY_PROJ, decoder=TINY_DEC)
    (cons / "config.json").write_text(cfg.to_json())

    _, params, _, _ = load_pretrained_model(str(cons), dtype=jnp.float32)
    assert set(params) == {"decoder", "vision", "projector"}
    np.testing.assert_allclose(
        np.asarray(params["decoder"]["embed_tokens"]),
        mistral.state_dict()["model.embed_tokens.weight"].numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(params["vision"]["pre_ln"]["scale"]),
        clip.state_dict()["vision_model.pre_layrnorm.weight"].numpy(),
        rtol=1e-6,
    )
