"""Splice op vs an explicit per-sample oracle that mirrors the reference
algorithm (vis_zephyr_arch.py:230-333)."""

import numpy as np
import jax.numpy as jnp

from vis_zephyr_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.ops.splice import compact_text_ids, splice_image_tokens


def oracle_splice(input_ids, text_embeds, image_embeds, n_img, text_valid, labels):
    """Reference-style python loop (multi-sentinel, vis_zephyr_arch.py:242-305:
    the k-th sentinel consumes the k-th image's feature block)."""
    n_img = np.atleast_2d(np.asarray(n_img).T).T if np.asarray(n_img).ndim == 1 else n_img
    out_embeds, out_labels, out_lens = [], [], []
    for b in range(input_ids.shape[0]):
        embeds, labs = [], []
        base, k = 0, 0
        for t in range(input_ids.shape[1]):
            if not text_valid[b, t]:
                continue
            if input_ids[b, t] == IMAGE_TOKEN_INDEX:
                n = n_img[b, k]
                embeds.extend(image_embeds[b, base : base + n])
                labs.extend([IGNORE_INDEX] * n)
                base += n
                k += 1
            else:
                embeds.append(text_embeds[b, t])
                labs.append(labels[b, t])
        out_embeds.append(np.array(embeds))
        out_labels.append(np.array(labs))
        out_lens.append(len(labs))
    return out_embeds, out_labels, out_lens


class TestSplice:
    def _make(self, rng, B=3, T=7, N=8, D=4):
        ids = rng.integers(5, 50, (B, T))
        # Sample 0: image at pos 1; sample 1: image at pos 0; sample 2: text-only.
        ids[0, 1] = IMAGE_TOKEN_INDEX
        ids[1, 0] = IMAGE_TOKEN_INDEX
        text_valid = np.ones((B, T), bool)
        text_valid[0, -2:] = False  # right padding
        n_img = np.array([6, 8, 0])
        text_embeds = rng.standard_normal((B, T, D)).astype(np.float32)
        image_embeds = rng.standard_normal((B, N, D)).astype(np.float32)
        labels = rng.integers(5, 50, (B, T))
        return ids, text_valid, n_img, text_embeds, image_embeds, labels

    def test_matches_oracle(self, rng):
        ids, valid, n_img, te, ie, labels = self._make(rng)
        out = splice_image_tokens(
            jnp.asarray(ids), jnp.asarray(te), jnp.asarray(ie),
            jnp.asarray(n_img), jnp.asarray(valid), jnp.asarray(labels),
        )
        o_embeds, o_labels, o_lens = oracle_splice(ids, te, ie, n_img, valid, labels)
        for b in range(ids.shape[0]):
            L = o_lens[b]
            assert int(out["lengths"][b]) == L
            np.testing.assert_allclose(np.asarray(out["embeds"][b, :L]), o_embeds[b], rtol=1e-6)
            np.testing.assert_array_equal(np.asarray(out["labels"][b, :L]), o_labels[b])
            assert bool(np.all(np.asarray(out["valid"][b, :L])))
            assert not bool(np.any(np.asarray(out["valid"][b, L:])))
            np.testing.assert_array_equal(np.asarray(out["positions"][b, :L]), np.arange(L))
            # Padded embeds are zero.
            np.testing.assert_array_equal(np.asarray(out["embeds"][b, L:]), 0.0)

    def test_multi_image_matches_oracle(self, rng):
        """Two/three sentinels per sample, each consuming its own block
        (reference multi-image loop)."""
        B, T, D = 3, 9, 4
        ids = rng.integers(5, 50, (B, T))
        # Sample 0: 2 images; sample 1: 3 images; sample 2: 1 image.
        ids[0, 1] = ids[0, 5] = IMAGE_TOKEN_INDEX
        ids[1, 0] = ids[1, 3] = ids[1, 7] = IMAGE_TOKEN_INDEX
        ids[2, 4] = IMAGE_TOKEN_INDEX
        text_valid = np.ones((B, T), bool)
        text_valid[0, -1:] = False
        n_img = np.array([[3, 4, 0], [2, 2, 3], [5, 0, 0]])
        N = int(n_img.sum(axis=1).max()) + 2  # some padding rows
        te = rng.standard_normal((B, T, D)).astype(np.float32)
        ie = rng.standard_normal((B, N, D)).astype(np.float32)
        labels = rng.integers(5, 50, (B, T))

        out = splice_image_tokens(
            jnp.asarray(ids), jnp.asarray(te), jnp.asarray(ie),
            jnp.asarray(n_img), jnp.asarray(text_valid), jnp.asarray(labels),
        )
        o_embeds, o_labels, o_lens = oracle_splice(ids, te, ie, n_img, text_valid, labels)
        for b in range(B):
            L = o_lens[b]
            assert int(out["lengths"][b]) == L
            np.testing.assert_allclose(
                np.asarray(out["embeds"][b, :L]), o_embeds[b], rtol=1e-6
            )
            np.testing.assert_array_equal(np.asarray(out["labels"][b, :L]), o_labels[b])

    def test_truncation(self, rng):
        ids, valid, n_img, te, ie, labels = self._make(rng)
        out = splice_image_tokens(
            jnp.asarray(ids), jnp.asarray(te), jnp.asarray(ie),
            jnp.asarray(n_img), jnp.asarray(valid), jnp.asarray(labels),
            max_length=6,
        )
        assert out["embeds"].shape[1] == 6
        assert int(out["lengths"].max()) <= 6

    def test_compact_text_ids(self):
        ids = np.array(
            [
                [7, IMAGE_TOKEN_INDEX, 9, 10],
                [IMAGE_TOKEN_INDEX, 11, 12, 2],
            ]
        )
        got, valid = compact_text_ids(jnp.asarray(ids), pad_id=2)
        np.testing.assert_array_equal(np.asarray(got), [[7, 9, 10], [11, 12, 2]])
        assert np.asarray(valid).all()

    def test_compact_text_ids_with_padding(self):
        ids = np.array([[7, IMAGE_TOKEN_INDEX, 9, 0, 0]])
        text_valid = np.array([[True, True, True, False, False]])
        got, valid = compact_text_ids(
            jnp.asarray(ids), pad_id=2, text_valid=jnp.asarray(text_valid)
        )
        np.testing.assert_array_equal(np.asarray(got), [[7, 9, 2, 2]])
        np.testing.assert_array_equal(np.asarray(valid), [[True, True, False, False]])
