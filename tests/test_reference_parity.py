"""Parity pinned against the ACTUAL reference package (`/root/reference`,
imported directly), not a re-construction — any architecture drift between
this framework and `vis_zephyr` fails loudly here.

Covers: the real `QFormer` class (its sizes are hard-coded at the released
4096/5120 width, so this runs at full projector width), the conversation
templates, the anyres geometry helpers, and sentinel tokenization.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
if REFERENCE_ROOT not in sys.path:
    sys.path.insert(0, REFERENCE_ROOT)

import jax.numpy as jnp  # noqa: E402

from vis_zephyr_tpu.config import ProjectorConfig  # noqa: E402
from vis_zephyr_tpu.conversation import templates as our_templates  # noqa: E402
from vis_zephyr_tpu.data import anyres  # noqa: E402
from vis_zephyr_tpu.data.tokenization import tokenize_with_images  # noqa: E402
from vis_zephyr_tpu.models.hf_convert import convert_qformer  # noqa: E402
from vis_zephyr_tpu.models.qformer import qformer_forward  # noqa: E402


class TestRealQFormer:
    def test_forward_matches_reference_class(self):
        """The released projector architecture is hard-coded in the reference
        (`multimodal_projector/builder.py:49-93`: 32 queries, 8 blocks,
        8 heads, 4096/5120 dims) — run the real module and pin our forward
        against it bit-for-bit (f32 tolerance)."""
        from types import SimpleNamespace

        from vis_zephyr.model.multimodal_projector.builder import QFormer

        torch.manual_seed(0)
        ref = QFormer(SimpleNamespace(hidden_size=4096)).eval()

        cfg = ProjectorConfig(
            num_queries=32, hidden_size=4096, visual_hidden_size=5120,
            num_blocks=8, num_heads=8, ffn_dim=8192,
        )
        params = convert_qformer(ref.state_dict(), cfg)

        rng = np.random.default_rng(0)
        B, T, L = 2, 6, 4
        feats = rng.standard_normal((B, T, 5120)).astype(np.float32)
        cond = rng.standard_normal((B, L, 4096)).astype(np.float32)

        with torch.no_grad():
            expect = ref(torch.from_numpy(feats),
                         text_embeddings=torch.from_numpy(cond)).numpy()
        got = np.asarray(qformer_forward(
            params, jnp.asarray(feats), cfg, text_embeddings=jnp.asarray(cond)
        ))
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


class TestConversationTemplates:
    @pytest.mark.parametrize("name", ["zephyr_v1", "zephyr_vcr"])
    def test_prompt_rendering_matches_reference(self, name):
        from vis_zephyr import conversation as ref_conv

        ref = ref_conv.templates[name].copy()
        ours = our_templates[name].copy()
        turns = [("<image>\nWhat is here?", "A cat."), ("And color?", None)]
        for q, a in turns:
            ref.append_message(ref.roles[0], q)
            ref.append_message(ref.roles[1], a)
            ours.append_message(ours.roles[0], q)
            ours.append_message(ours.roles[1], a)
        assert ours.get_prompt() == ref.get_prompt()

    def test_plain_style_is_dead_in_reference(self):
        """The reference's PLAIN separator style is unrenderable in its own
        code (`conversation.py:61` raises Unknown separator style) — its
        training path builds plain prompts manually instead. We implement a
        working renderer; this pins the reference fact so the deliberate
        divergence is visible if upstream ever fixes it."""
        from vis_zephyr import conversation as ref_conv

        ref = ref_conv.templates["plain"].copy()
        ref.append_message(ref.roles[0], "<image>\n")
        ref.append_message(ref.roles[1], "a photo")
        with pytest.raises(ValueError, match="Unknown separator style"):
            ref.get_prompt()
        ours = our_templates["plain"].copy()
        ours.append_message(ours.roles[0], "<image>\n")
        ours.append_message(ours.roles[1], "a photo")
        assert isinstance(ours.get_prompt(), str)


class TestAnyresGeometry:
    SIZES = [(640, 480), (1024, 1024), (336, 1344), (500, 321), (2000, 100)]
    PINS = "[[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]"

    @pytest.mark.parametrize("size", SIZES)
    def test_best_fit_matches_reference(self, size):
        from vis_zephyr.model import multi_scale_process as ref_msp

        pins = anyres.parse_grid_pinpoints(self.PINS)
        assert anyres.select_best_fit_resolution(size, pins) == tuple(
            ref_msp.select_best_fit_resolution(size, [list(p) for p in pins])
        )

    @pytest.mark.parametrize("size", SIZES)
    def test_grid_shape_matches_reference(self, size):
        from vis_zephyr.model import multi_scale_process as ref_msp

        assert anyres.calculate_grid_shape(size, self.PINS, 336) == tuple(
            ref_msp.calculate_grid_shape(size, self.PINS, 336)
        )


class TestSentinelTokenization:
    def test_matches_reference_tokenizer_image_token(self, mock_tokenizer):
        from vis_zephyr.model.mm_utils import tokenizer_image_token

        for prompt in [
            "<image>\nDescribe this",
            "system text\n<image> question follows",
            "no image at all",
        ]:
            expect = tokenizer_image_token(prompt, mock_tokenizer)
            got = tokenize_with_images(prompt, mock_tokenizer)
            assert list(got) == list(expect), prompt
