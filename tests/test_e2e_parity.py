"""End-to-end golden parity: greedy decodes from the full JAX stack must
match a torch/HF construction of the reference pipeline token-for-token
(BASELINE.json output-fidelity criterion: "same projected vision tokens &
same greedy decodes").

The torch side is assembled from HF CLIPVisionModel + the documented
Q-Former architecture + HF MistralForCausalLM with the reference's
flat-merge token splice (vis_zephyr_arch.py:129-333 semantics for a single
unpadded sample, where this framework's behavior is identical by design).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vis_zephyr_tpu.config import (  # noqa: E402
    DecoderConfig,
    ProjectorConfig,
    VisionConfig,
    VisZephyrConfig,
)
from vis_zephyr_tpu.constants import IMAGE_TOKEN_INDEX  # noqa: E402
from vis_zephyr_tpu.models.hf_convert import (  # noqa: E402
    convert_clip_vision,
    convert_mistral,
    convert_qformer,
)
from vis_zephyr_tpu.models.vis_zephyr import encode_images, vis_zephyr_forward  # noqa: E402
from vis_zephyr_tpu.serve.generate import SamplingConfig, generate  # noqa: E402

from test_mistral_parity import make_torch_mistral  # noqa: E402
from test_vision_parity import TorchQFormer, make_torch_clip  # noqa: E402

VISION = VisionConfig(
    hidden_size=32, intermediate_size=64, num_layers=4, num_heads=4,
    image_size=56, patch_size=14, num_fusion_groups=1, layers_per_group=2,
)
PROJ = ProjectorConfig(
    num_queries=8, hidden_size=64, visual_hidden_size=64, num_blocks=2,
    num_heads=4, ffn_dim=128,
)
DEC = DecoderConfig(
    vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=3,
    num_heads=4, num_kv_heads=2, head_dim=16, sliding_window=None,
)
CFG = VisZephyrConfig(vision=VISION, projector=PROJ, decoder=DEC)


@pytest.fixture(scope="module")
def models():
    clip = make_torch_clip(VISION)
    torch.manual_seed(7)
    qformer = TorchQFormer(PROJ).eval()
    mistral = make_torch_mistral(DEC)
    params = {
        "vision": convert_clip_vision(clip.state_dict(), VISION),
        "projector": convert_qformer(qformer.state_dict(), PROJ),
        "decoder": convert_mistral(mistral.state_dict(), DEC),
    }
    return clip, qformer, mistral, params


def torch_fusion(hidden_states, groups, per_group):
    selected = [h[:, 1:] for h in hidden_states[-(groups * per_group + 1):]]
    inter, final = selected[:-1], selected[-1]
    fused = []
    for g in range(groups):
        fused.append(torch.stack(inter[g * per_group : (g + 1) * per_group]).mean(0))
    return torch.cat(fused + [final], dim=-1)


def torch_pipeline_logits(clip, qformer, mistral, ids, pixels):
    """One full reference-style forward: ids [T] with one sentinel,
    pixels [P, 3, H, W]. Returns logits [T_out, V]."""
    with torch.no_grad():
        text_only = ids[ids != IMAGE_TOKEN_INDEX]
        embed = mistral.get_input_embeddings()
        cond = embed(text_only)[None].expand(pixels.shape[0], -1, -1)

        out = clip(pixels, output_hidden_states=True)
        fused = torch_fusion(out.hidden_states, VISION.num_fusion_groups,
                             VISION.layers_per_group)
        projected = qformer(fused, text_embeddings=cond)   # [P, Q, D]
        image_feats = projected.reshape(-1, projected.shape[-1])  # flat merge

        pos = int((ids == IMAGE_TOKEN_INDEX).nonzero()[0])
        parts = [embed(ids[:pos]), image_feats, embed(ids[pos + 1 :])]
        inputs_embeds = torch.cat(parts, dim=0)[None]
        return mistral(inputs_embeds=inputs_embeds).logits[0]


def torch_greedy(clip, qformer, mistral, ids, pixels, steps):
    ids = ids.clone()
    out_tokens = []
    for _ in range(steps):
        logits = torch_pipeline_logits(clip, qformer, mistral, ids, pixels)
        tok = int(logits[-1].argmax())
        out_tokens.append(tok)
        ids = torch.cat([ids, torch.tensor([tok])])
    return out_tokens


@pytest.fixture(scope="module")
def sample(rng):
    T, P = 7, 3
    ids = rng.integers(5, DEC.vocab_size, (T,))
    ids[2] = IMAGE_TOKEN_INDEX
    pixels = rng.standard_normal((P, 3, VISION.image_size, VISION.image_size)).astype(
        np.float32
    )
    return ids, pixels


# module-scope rng workaround: pytest fixtures in conftest are function-scope
@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(123)


class TestEndToEndParity:
    def test_projected_vision_tokens_match(self, models, sample):
        clip, qformer, mistral, params = models
        ids, pixels = sample
        tids = torch.from_numpy(ids)

        with torch.no_grad():
            text_only = tids[tids != IMAGE_TOKEN_INDEX]
            cond = mistral.get_input_embeddings()(text_only)[None].expand(
                pixels.shape[0], -1, -1
            )
            out = clip(torch.from_numpy(pixels), output_hidden_states=True)
            fused = torch_fusion(out.hidden_states, 1, 2)
            expect = qformer(fused, text_embeddings=cond).numpy()

        got = encode_images(
            params,
            jnp.asarray(pixels.transpose(0, 2, 3, 1)),
            CFG,
            text_embeddings=jnp.asarray(cond.numpy()),
        )
        np.testing.assert_allclose(np.asarray(got), expect, rtol=3e-4, atol=3e-5)

    def test_prefill_logits_match(self, models, sample):
        clip, qformer, mistral, params = models
        ids, pixels = sample
        expect = torch_pipeline_logits(
            clip, qformer, mistral, torch.from_numpy(ids), torch.from_numpy(pixels)
        ).numpy()

        logits, aux = vis_zephyr_forward(
            params,
            jnp.asarray(ids[None]),
            jnp.asarray(pixels.transpose(0, 2, 3, 1))[None],
            jnp.ones((1, pixels.shape[0]), bool),
            CFG,
        )
        L = int(aux["lengths"][0])
        assert L == expect.shape[0]
        np.testing.assert_allclose(
            np.asarray(logits[0, :L]), expect, rtol=3e-3, atol=3e-3
        )

    def test_greedy_decodes_match(self, models, sample):
        clip, qformer, mistral, params = models
        ids, pixels = sample
        steps = 8
        expect = torch_greedy(
            clip, qformer, mistral, torch.from_numpy(ids), torch.from_numpy(pixels), steps
        )
        got = generate(
            params,
            jnp.asarray(ids[None]),
            jnp.asarray(pixels.transpose(0, 2, 3, 1))[None],
            jnp.ones((1, pixels.shape[0]), bool),
            CFG,
            SamplingConfig(max_new_tokens=steps, temperature=0.0, eos_token_id=-1),
        )[0]
        assert list(got) == expect
