"""Tests for image-token splicing and label masking."""

import numpy as np

from vis_zephyr_tpu.constants import IGNORE_INDEX, IMAGE_TOKEN_INDEX
from vis_zephyr_tpu.conversation import templates
from vis_zephyr_tpu.data.tokenization import (
    find_stop,
    get_model_name_from_path,
    preprocess,
    preprocess_pretrain,
    preprocess_zephyr,
    tokenize_with_images,
)


class TestTokenizeWithImages:
    def test_basic_splice(self, mock_tokenizer):
        ids = tokenize_with_images("hello <image> world", mock_tokenizer)
        # BOS kept once, image sentinel spliced between chunks.
        assert ids[0] == mock_tokenizer.bos_token_id
        assert ids.count(IMAGE_TOKEN_INDEX) == 1
        assert ids.count(mock_tokenizer.bos_token_id) == 1
        img_pos = ids.index(IMAGE_TOKEN_INDEX)
        text_ids = mock_tokenizer("hello world").input_ids
        assert ids[img_pos - 1] == text_ids[1]  # "hello"
        assert ids[img_pos + 1] == text_ids[2]  # "world"

    def test_image_first(self, mock_tokenizer):
        ids = tokenize_with_images("<image>\ncaption here", mock_tokenizer)
        assert ids[0] == mock_tokenizer.bos_token_id
        assert ids[1] == IMAGE_TOKEN_INDEX

    def test_no_image(self, mock_tokenizer):
        ids = tokenize_with_images("just text", mock_tokenizer)
        assert IMAGE_TOKEN_INDEX not in ids
        assert ids == mock_tokenizer("just text").input_ids

    def test_multiple_images(self, mock_tokenizer):
        ids = tokenize_with_images("a <image> b <image> c", mock_tokenizer)
        assert ids.count(IMAGE_TOKEN_INDEX) == 2
        assert ids.count(mock_tokenizer.bos_token_id) == 1


class TestPreprocessZephyr:
    def _sources(self):
        return [
            [
                {"from": "human", "value": "<image>\nWhat is shown?"},
                {"from": "gpt", "value": "A dog playing."},
            ]
        ]

    def test_assistant_tokens_supervised(self, mock_tokenizer):
        out = preprocess_zephyr(self._sources(), mock_tokenizer, has_image=True)
        ids, labels = out["input_ids"][0], out["labels"][0]
        assert ids.shape == labels.shape
        supervised = labels != IGNORE_INDEX
        # Some (but not all) positions supervised; all supervised positions
        # must coincide with their input ids.
        assert supervised.any() and not supervised.all()
        np.testing.assert_array_equal(labels[supervised], ids[supervised])
        # The supervised tokens are exactly the assistant reply + closing </s>.
        reply_ids = mock_tokenizer("A dog playing. </s>").input_ids[1:]
        np.testing.assert_array_equal(ids[supervised], reply_ids)

    def test_image_sentinel_never_supervised(self, mock_tokenizer):
        out = preprocess_zephyr(self._sources(), mock_tokenizer, has_image=True)
        ids, labels = out["input_ids"][0], out["labels"][0]
        assert (labels[ids == IMAGE_TOKEN_INDEX] == IGNORE_INDEX).all()

    def test_bos_masked(self, mock_tokenizer):
        out = preprocess_zephyr(self._sources(), mock_tokenizer, has_image=True)
        assert out["labels"][0][0] == IGNORE_INDEX

    def test_multi_turn(self, mock_tokenizer):
        sources = [
            [
                {"from": "human", "value": "<image>\nQ1"},
                {"from": "gpt", "value": "A1"},
                {"from": "human", "value": "Q2"},
                {"from": "gpt", "value": "A2 longer reply"},
            ]
        ]
        out = preprocess_zephyr(sources, mock_tokenizer, has_image=True)
        ids, labels = out["input_ids"][0], out["labels"][0]
        supervised_ids = ids[labels != IGNORE_INDEX]
        expect = (
            mock_tokenizer("A1 </s>").input_ids[1:]
            + mock_tokenizer("A2 longer reply </s>").input_ids[1:]
        )
        np.testing.assert_array_equal(supervised_ids, expect)

    def test_mismatch_masks_everything(self, mock_tokenizer):
        # Sabotage: a tokenizer whose re-tokenized turn lengths can't match.
        class BadTok:
            bos_token_id = 1
            pad_token_id = 0
            model_max_length = 4096

            class _Out:
                def __init__(self, ids):
                    self.input_ids = ids

            def __init__(self, inner):
                self.inner = inner
                self.calls = 0

            def __call__(self, text, **kw):
                self.calls += 1
                ids = self.inner(text).input_ids
                # Drop a token on every 3rd call to desynchronize lengths.
                if self.calls % 3 == 0 and len(ids) > 2:
                    ids = ids[:-1]
                return self._Out(ids)

        warnings = []
        out = preprocess_zephyr(
            self._sources(),
            BadTok(mock_tokenizer),
            has_image=True,
            warn=warnings.append,
        )
        assert (out["labels"][0] == IGNORE_INDEX).all()
        assert warnings


class TestPreprocessPretrain:
    def test_caption_supervised_image_masked(self, mock_tokenizer):
        sources = [
            [
                {"from": "human", "value": "<image>\nDescribe."},
                {"from": "gpt", "value": "blue sky over hills"},
            ]
        ]
        out = preprocess_pretrain(sources, mock_tokenizer)
        ids, labels = out["input_ids"][0], out["labels"][0]
        prefix_len = len(tokenize_with_images("<image>", mock_tokenizer))
        assert (labels[:prefix_len] == IGNORE_INDEX).all()
        np.testing.assert_array_equal(labels[prefix_len:], ids[prefix_len:])
        assert ids[1] == IMAGE_TOKEN_INDEX

    def test_dispatch(self, mock_tokenizer):
        sources = [
            [
                {"from": "human", "value": "<image>\nDescribe."},
                {"from": "gpt", "value": "a caption"},
            ]
        ]
        out = preprocess(sources, mock_tokenizer, conv=templates["plain"])
        assert (out["labels"][0][:2] == IGNORE_INDEX).all()


def test_get_model_name_from_path():
    assert get_model_name_from_path("/a/b/vis-zephyr-7b") == "vis-zephyr-7b"
    assert (
        get_model_name_from_path("/a/vis-zephyr-7b/checkpoint-500/")
        == "vis-zephyr-7b_checkpoint-500"
    )


def test_find_stop():
    assert find_stop([5, 6, 2], [[2]])
    assert not find_stop([5, 6, 2], [[2, 2]])
    assert find_stop([5, 6, 7, 8], [[9], [7, 8]])
    assert not find_stop([], [[2]])
