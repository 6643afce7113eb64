"""Numerical parity of the JAX vision stack vs the HF/torch reference stack.

Uses tiny randomly initialized torch models (no network access needed) and
checks the converted JAX model reproduces their outputs.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from vis_zephyr_tpu.config import ProjectorConfig, VisionConfig  # noqa: E402
from vis_zephyr_tpu.models.clip_vit import clip_vit_forward, select_and_stack  # noqa: E402
from vis_zephyr_tpu.models.fusion import dense_channel_fusion  # noqa: E402
from vis_zephyr_tpu.models.hf_convert import convert_clip_vision, convert_qformer  # noqa: E402
from vis_zephyr_tpu.models.qformer import qformer_forward  # noqa: E402


TINY_VISION = VisionConfig(
    hidden_size=32,
    intermediate_size=64,
    num_layers=4,
    num_heads=4,
    image_size=56,
    patch_size=14,
    num_fusion_groups=1,
    layers_per_group=2,
)


def make_torch_clip(cfg: VisionConfig):
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    model = transformers.CLIPVisionModel(hf_cfg).eval()
    return model


class TestClipVit:
    def test_all_hidden_states_match_hf(self):
        cfg = TINY_VISION
        model = make_torch_clip(cfg)
        params = convert_clip_vision(model.state_dict(), cfg)

        rng = np.random.default_rng(0)
        pixels = rng.standard_normal((2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)

        with torch.no_grad():
            out = model(torch.from_numpy(pixels), output_hidden_states=True)
        torch_states = [h.numpy() for h in out.hidden_states]

        jax_states = clip_vit_forward(
            params, jnp.asarray(pixels.transpose(0, 2, 3, 1)), cfg
        )
        assert jax_states.shape[0] == len(torch_states) == cfg.num_layers + 1
        for i, ts in enumerate(torch_states):
            np.testing.assert_allclose(
                np.asarray(jax_states[i]), ts, rtol=2e-4, atol=2e-5,
                err_msg=f"hidden state {i}",
            )

    def test_select_and_stack_drops_cls(self):
        cfg = TINY_VISION
        model = make_torch_clip(cfg)
        params = convert_clip_vision(model.state_dict(), cfg)
        pixels = np.zeros((1, cfg.image_size, cfg.image_size, 3), np.float32)
        states = clip_vit_forward(params, jnp.asarray(pixels), cfg)
        sel = select_and_stack(states, cfg)
        assert sel.shape == (
            cfg.num_selected_layers,
            1,
            cfg.tokens_per_image,
            cfg.hidden_size,
        )


class TestFusion:
    def test_group_mean_concat_oracle(self, rng):
        # 21 layers → 4 groups of 5 + final, as in the full model.
        S, B, T, C = 21, 2, 6, 8
        feats = rng.standard_normal((S, B, T, C)).astype(np.float32)
        fused = np.asarray(dense_channel_fusion(jnp.asarray(feats), num_groups=4))
        assert fused.shape == (B, T, 5 * C)
        for g in range(4):
            expect = feats[g * 5 : (g + 1) * 5].mean(axis=0)
            np.testing.assert_allclose(fused[..., g * C : (g + 1) * C], expect, rtol=1e-6)
        np.testing.assert_allclose(fused[..., 4 * C :], feats[-1], rtol=1e-6)


# ---------------------------------------------------------------------------
# Q-Former parity vs a torch construction of the documented architecture
# (reference model/multimodal_projector/builder.py:12-101).
# ---------------------------------------------------------------------------

class TorchQFormerBlock(torch.nn.Module):
    def __init__(self, hidden, heads, ffn_dim, kv_dim):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(hidden)
        self.self_attn = torch.nn.MultiheadAttention(hidden, heads, batch_first=True)
        self.norm2 = torch.nn.LayerNorm(hidden)
        self.cross_attn = torch.nn.MultiheadAttention(
            embed_dim=hidden, num_heads=heads, kdim=kv_dim, vdim=kv_dim, batch_first=True
        )
        self.norm3 = torch.nn.LayerNorm(hidden)
        self.ffn = torch.nn.Sequential(
            torch.nn.Linear(hidden, ffn_dim), torch.nn.GELU(), torch.nn.Linear(ffn_dim, hidden)
        )

    def forward(self, queries, visual):
        q = self.norm1(queries)
        queries = queries + self.self_attn(q, q, q)[0]
        q = self.norm2(queries)
        queries = queries + self.cross_attn(q, visual, visual)[0]
        q = self.norm3(queries)
        return queries + self.ffn(q)


class TorchQFormer(torch.nn.Module):
    def __init__(self, cfg: ProjectorConfig):
        super().__init__()
        self.cfg = cfg
        self.learned_queries = torch.nn.Parameter(torch.randn(cfg.num_queries, cfg.hidden_size))
        self.blocks = torch.nn.ModuleList(
            [
                TorchQFormerBlock(cfg.hidden_size, cfg.num_heads, cfg.ffn_dim, cfg.visual_hidden_size)
                for _ in range(cfg.num_blocks)
            ]
        )
        self.pre_norm = torch.nn.LayerNorm(cfg.visual_hidden_size)
        self.norm = torch.nn.LayerNorm(cfg.hidden_size)

    def forward(self, features, text_embeddings=None):
        B = features.size(0)
        features = self.pre_norm(features)
        queries = self.learned_queries.unsqueeze(0).expand(B, -1, -1)
        init = queries if text_embeddings is None else torch.cat([queries, text_embeddings], dim=1)
        out = self.blocks[0](init, features)
        queries = out[:, : self.cfg.num_queries, :]
        for blk in self.blocks[1:]:
            queries = blk(queries, features)
        return self.norm(queries)


TINY_PROJ = ProjectorConfig(
    num_queries=8, hidden_size=32, visual_hidden_size=48, num_blocks=3, num_heads=4, ffn_dim=64
)


class TestQFormer:
    @pytest.mark.parametrize("with_text", [False, True])
    def test_parity(self, with_text, rng):
        cfg = TINY_PROJ
        torch.manual_seed(1)
        ref = TorchQFormer(cfg).eval()
        params = convert_qformer(ref.state_dict(), cfg)

        B, Tv, L = 2, 12, 5
        visual = rng.standard_normal((B, Tv, cfg.visual_hidden_size)).astype(np.float32)
        text = (
            rng.standard_normal((B, L, cfg.hidden_size)).astype(np.float32) if with_text else None
        )

        with torch.no_grad():
            expect = ref(
                torch.from_numpy(visual),
                None if text is None else torch.from_numpy(text),
            ).numpy()

        got = np.asarray(
            qformer_forward(
                params,
                jnp.asarray(visual),
                cfg,
                text_embeddings=None if text is None else jnp.asarray(text),
            )
        )
        assert got.shape == (B, cfg.num_queries, cfg.hidden_size)
        np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-5)

    def test_text_conditioning_changes_output(self, rng):
        cfg = TINY_PROJ
        torch.manual_seed(1)
        ref = TorchQFormer(cfg)
        params = convert_qformer(ref.state_dict(), cfg)
        visual = jnp.asarray(rng.standard_normal((1, 12, cfg.visual_hidden_size)), jnp.float32)
        text = jnp.asarray(rng.standard_normal((1, 4, cfg.hidden_size)), jnp.float32)
        a = qformer_forward(params, visual, cfg)
        b = qformer_forward(params, visual, cfg, text_embeddings=text)
        assert not np.allclose(np.asarray(a), np.asarray(b))
