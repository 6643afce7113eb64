"""Spatial / spatial_unpad patch-merge parity — pinned against the ACTUAL
reference `_process_image_patches` (`vis_zephyr_arch.py:396-473`), run with
per-cell features so its grid assert holds (with the reference's own
Q-Former output the path is unreachable, SURVEY §2.4.4 — it requires the
mlp2x_gelu projector this framework makes live)."""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vis_zephyr_tpu.config import tiny_config  # noqa: E402
from vis_zephyr_tpu.data import anyres  # noqa: E402
from vis_zephyr_tpu.ops.patch_merge import (  # noqa: E402
    merge_grid_bounds,
    merge_info_host,
    spatial_merge,
    spatial_merge_info,
)

D = 8
SIDE = 56       # crop side (tiny config's vision.image_size)
TPS = 4         # tokens per side (56 / 14)
PINS = "[[56, 112], [112, 56], [56, 168], [168, 56]]"


def _reference_merge(features_np, images_size, merge_type, newline_np):
    """Run the reference implementation via a duck-typed self."""
    from types import SimpleNamespace

    from vis_zephyr.model.vis_zephyr_arch import VisZephyrMetaForCausalLM

    class Duck(VisZephyrMetaForCausalLM):
        def __init__(self):
            self.config = SimpleNamespace(
                mm_patch_merge_type=merge_type,
                image_aspect_ratio="anyres",
                mm_grid_pinpoints=PINS,
            )
            self._model = SimpleNamespace(
                image_newline=torch.from_numpy(newline_np))

        def get_model(self):
            return self._model

        def get_vision_tower(self):
            return SimpleNamespace(
                num_patches_per_side=TPS,
                config=SimpleNamespace(image_size=SIDE),
            )

    duck = Duck()
    feats = [torch.from_numpy(features_np)]
    out = duck._process_image_patches(feats, [images_size])
    return out[0].numpy()


def _our_merge(features_np, images_size, merge_type, newline_np, max_patches=4):
    cfg = tiny_config().replace(
        mm_projector_type="mlp2x_gelu",
        mm_patch_merge_type=merge_type,
        mm_grid_pinpoints=PINS,
    )
    P_valid = features_np.shape[0]
    padded = np.zeros((1, max_patches, TPS * TPS, D), np.float32)
    padded[0, :P_valid] = features_np
    info = spatial_merge_info(images_size, cfg, n_patches=P_valid)[None]
    embeds, counts = spatial_merge(
        jnp.asarray(padded), jnp.asarray(info), cfg,
        image_newline=jnp.asarray(newline_np),
    )
    return np.asarray(embeds[0]), int(counts[0])


def _oracle_unpad_merge(feats, images_size, newline):
    """Correct-geometry spatial_unpad oracle (what the reference *intends*:
    LLaVA-style crop of the letterbox padding + newline per row). The
    reference's own `unpad_image` is defective on this path — see
    `test_reference_unpad_axis_swap_documented`."""
    gw, gh = anyres.calculate_grid_shape(images_size, PINS, SIDE)
    base = feats[0]
    tiles = (
        feats[1:]
        .reshape(gh, gw, TPS, TPS, D)
        .transpose(0, 2, 1, 3, 4)
        .reshape(gh * TPS, gw * TPS, D)
    )
    w_sl, h_sl = anyres.unpad_slice(images_size, (gw * TPS, gh * TPS))
    cropped = tiles[h_sl, w_sl]
    with_nl = np.concatenate(
        [cropped, np.broadcast_to(newline, (cropped.shape[0], 1, D))], axis=1
    )
    return np.concatenate([base, with_nl.reshape(-1, D)], axis=0)


@pytest.mark.parametrize(
    "images_size", [(100, 80), (80, 200), (300, 60), (60, 140)]
)
def test_spatial_merge_matches_reference(images_size):
    """Non-unpad spatial arrangement: bit-exact against the actual
    reference code (its grid layout logic is sound; only unpad is broken)."""
    rng = np.random.default_rng(hash(images_size) % 2**32)
    gw, gh = anyres.calculate_grid_shape(images_size, PINS, SIDE)
    P_valid = 1 + gw * gh
    feats = rng.standard_normal((P_valid, TPS * TPS, D)).astype(np.float32)
    newline = rng.standard_normal(D).astype(np.float32)

    expect = _reference_merge(feats, images_size, "spatial", newline)
    got, count = _our_merge(feats, images_size, "spatial", newline)

    assert count == expect.shape[0], (count, expect.shape)
    np.testing.assert_allclose(got[:count], expect, rtol=0, atol=0)
    # Padding tail is zeroed (splice contract: valid tokens compacted front).
    assert not got[count:].any()


@pytest.mark.parametrize(
    "images_size", [(100, 80), (80, 200), (300, 60), (60, 140), (112, 56)]
)
def test_spatial_unpad_merge_matches_oracle(images_size):
    rng = np.random.default_rng(hash(images_size) % 2**32)
    gw, gh = anyres.calculate_grid_shape(images_size, PINS, SIDE)
    P_valid = 1 + gw * gh
    feats = rng.standard_normal((P_valid, TPS * TPS, D)).astype(np.float32)
    newline = rng.standard_normal(D).astype(np.float32)

    expect = _oracle_unpad_merge(feats, images_size, newline)
    got, count = _our_merge(feats, images_size, "spatial_unpad", newline)
    assert count == expect.shape[0], (count, expect.shape)
    np.testing.assert_allclose(got[:count], expect, rtol=0, atol=0)
    assert not got[count:].any()


def test_reference_unpad_axis_swap_documented():
    """The reference's `unpad_image` (`multi_scale_process.py:188-211`)
    unpacks `current_w, current_h = image_tensor.shape[1:]` from a
    [D, H, W] tensor — width and height swapped — so its unpad crops the
    wrong axis by the wrong amount on non-square grids. This test pins the
    defect so the (intentional) divergence from `_our_merge` stays visible:
    for a 100×80 image on a 2×1 tile grid, correct unpad keeps the full
    4-row height (the crop should trim columns), but the reference returns
    2 rows."""
    rng = np.random.default_rng(3)
    images_size = (100, 80)
    gw, gh = anyres.calculate_grid_shape(images_size, PINS, SIDE)
    assert (gw, gh) == (2, 1)
    feats = rng.standard_normal((1 + gw * gh, TPS * TPS, D)).astype(np.float32)
    newline = rng.standard_normal(D).astype(np.float32)

    ref = _reference_merge(feats, images_size, "spatial_unpad", newline)
    correct = _oracle_unpad_merge(feats, images_size, newline)
    # Reference: 16 base + 2 rows × (8 cols + newline) = 34 — height was
    # cropped even though the letterbox padding is horizontal.
    assert ref.shape[0] == 34
    # Correct geometry keeps 4 rows × (6 cols + newline) = 28 + 16 base.
    assert correct.shape[0] == 44


@pytest.mark.parametrize("merge_type", ["spatial", "spatial_unpad"])
def test_merge_single_crop_matches_reference(merge_type):
    """Tile-less image (aspect pad/square): reference keeps the global
    crop's tokens, plus one newline under unpad (`vis_zephyr_arch.py:462-468`)."""
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((1, TPS * TPS, D)).astype(np.float32)
    newline = rng.standard_normal(D).astype(np.float32)

    expect = _reference_merge(feats, (SIDE, SIDE), merge_type, newline)
    got, count = _our_merge(feats, (SIDE, SIDE), merge_type, newline)
    assert count == expect.shape[0]
    np.testing.assert_allclose(got[:count], expect, rtol=0, atol=0)


def test_merge_info_host_matches_cfg_wrapper():
    cfg = tiny_config().replace(
        mm_patch_merge_type="spatial_unpad", mm_grid_pinpoints=PINS
    )
    a = spatial_merge_info((100, 80), cfg, n_patches=3)
    b = merge_info_host((100, 80), PINS, SIDE, TPS, "spatial_unpad", 3)
    np.testing.assert_array_equal(a, b)


def test_grid_bounds_cover_every_pinpoint():
    cfg = tiny_config().replace(
        mm_projector_type="mlp2x_gelu",
        mm_patch_merge_type="spatial_unpad",
        mm_grid_pinpoints=PINS,
    )
    GH, GW, M = merge_grid_bounds(cfg)
    assert GH == 3 * TPS and GW == 3 * TPS
    # Widest pinpoint (56×168 → 1×3 tiles): 12 rows × (4 cols + newline).
    assert M == 12 * 5
    for size in [(100, 80), (80, 200), (300, 60)]:
        info = spatial_merge_info(size, cfg, n_patches=4)
        gw, rows, cols, y0, x0 = (int(v) for v in info)
        assert rows <= GH and cols + 1 <= GW + 1
        assert rows * (cols + 1) <= M


def test_end_to_end_forward_mlp_spatial_unpad():
    """Full multimodal forward with the MLP projector + spatial_unpad merge:
    shapes static, logits finite, token accounting correct."""
    from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
    from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr, vis_zephyr_forward

    cfg = tiny_config().replace(
        mm_projector_type="mlp2x_gelu",
        mm_patch_merge_type="spatial_unpad",
        mm_grid_pinpoints=PINS,
    )
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))
    assert "image_newline" in params["projector"]

    rng = np.random.default_rng(0)
    B, T, P = 2, 12, 4
    ids = rng.integers(5, cfg.decoder.vocab_size, (B, T))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    sizes = [(100, 80), (80, 200)]
    infos = np.stack([spatial_merge_info(s, cfg, n_patches=P) for s in sizes])
    images = rng.standard_normal((B, P, SIDE, SIDE, 3)).astype(np.float32)

    logits, aux = vis_zephyr_forward(
        params, jnp.asarray(ids), jnp.asarray(images),
        jnp.ones((B, P), bool), cfg, merge_info=jnp.asarray(infos),
    )
    assert np.isfinite(np.asarray(logits)).all()
    # lengths = text (T-1 non-sentinel) + merged image tokens.
    for b, size in enumerate(sizes):
        gw, rows, cols, y0, x0 = (int(v) for v in infos[b])
        n_img = TPS * TPS + rows * (cols + 1)
        assert int(aux["lengths"][b]) == (T - 1) + n_img


def test_flat_merge_with_mlp_projector():
    """mm_projector_type=mlp2x_gelu with flat merge: every crop contributes
    tps² tokens, no merge_info needed."""
    from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX
    from vis_zephyr_tpu.models.vis_zephyr import init_vis_zephyr, vis_zephyr_forward

    cfg = tiny_config().replace(mm_projector_type="mlp2x_gelu")
    assert cfg.tokens_per_patch == TPS * TPS
    params = init_vis_zephyr(cfg, jax.random.PRNGKey(0))

    rng = np.random.default_rng(1)
    B, T, P = 1, 10, 3
    ids = rng.integers(5, cfg.decoder.vocab_size, (B, T))
    ids[:, 1] = IMAGE_TOKEN_INDEX
    images = rng.standard_normal((B, P, SIDE, SIDE, 3)).astype(np.float32)

    logits, aux = vis_zephyr_forward(
        params, jnp.asarray(ids), jnp.asarray(images), jnp.ones((B, P), bool), cfg
    )
    assert int(aux["lengths"][0]) == (T - 1) + P * TPS * TPS
    assert np.isfinite(np.asarray(logits)).all()
