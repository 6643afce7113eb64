"""Visual prompting tests: geometry, drawing, text rewriting, and the VCR
pipeline on the reference's real fixture item."""

import json
import os
import random

import numpy as np
import pytest

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

from vis_zephyr_tpu.data.vip import geometry, text  # noqa: E402
from vis_zephyr_tpu.data.vip.config import COLOR_POOL, SHAPE_WORDS  # noqa: E402
from vis_zephyr_tpu.data.vip.draw import blend_shape  # noqa: E402
from vis_zephyr_tpu.data.vip.processor import supports, visual_prompt_process  # noqa: E402

VCR_JSON = "/root/reference/playground/data/tuning/test.json"
VCR_IMAGES = "/root/reference/playground/data/tuning/images"


class TestGeometry:
    def test_point_in_polygon(self):
        square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
        assert geometry.point_in_polygon(5, 5, square)
        assert not geometry.point_in_polygon(15, 5, square)
        assert not geometry.point_in_polygon(-1, 5, square)

    def test_polygon_set_union_bounds_and_contains(self):
        ps = geometry.PolygonSet.from_flat(
            [[0, 0, 10, 0, 10, 10, 0, 10], [20, 20, 30, 20, 30, 30, 20, 30]]
        )
        assert ps.bounds == (0.0, 0.0, 30.0, 30.0)
        assert ps.contains(5, 5) and ps.contains(25, 25)
        assert not ps.contains(15, 15)  # between the two squares

    def test_uniform_point_in_polygon_lands_inside(self):
        ps = geometry.PolygonSet.from_flat([[0, 0, 100, 0, 100, 50, 0, 50]])
        rng = random.Random(0)
        for _ in range(20):
            x, y = geometry.uniform_point_in_polygon(ps, rng)
            assert 0 <= x <= 100 and 0 <= y <= 50

    def test_gaussian_point_rejection(self):
        ps = geometry.PolygonSet.from_flat([[40, 40, 60, 40, 60, 60, 40, 60]])
        rng = random.Random(0)
        hits = 0
        for _ in range(50):
            x, y = geometry.gaussian_point_in_polygon(ps, ps.bounds, rng)
            if ps.contains(x, y):
                hits += 1
        assert hits >= 45  # rejection mostly succeeds on a centered box

    def test_triangle_angle_filter(self):
        assert geometry.max_angle_below([(0, 0), (10, 0), (5, 8)])
        assert not geometry.max_angle_below([(0, 0), (10, 0), (5, 0.1)])  # degenerate

    def test_bezier_endpoints(self):
        curve = geometry.cubic_bezier((0, 0), (1, 2), (3, 4), (10, 10), num=50)
        np.testing.assert_allclose(curve[0], (0, 0))
        np.testing.assert_allclose(curve[-1], (10, 10))


class TestDrawing:
    @pytest.mark.parametrize(
        "shape", ["rectangle", "ellipse", "arrow", "triangle", "point", "scribble",
                  "mask contour", "mask"],
    )
    def test_each_shape_modifies_image(self, shape):
        img = Image.new("RGB", (200, 150), (0, 0, 0))
        segs = [[50, 40, 120, 40, 120, 100, 50, 100]]
        out = blend_shape(
            img, shape, (50, 40, 120, 100), segs, (255, 0, 0),
            random.Random(0), alpha=255,
        )
        assert out.size == img.size
        assert np.asarray(out).sum() > 0  # something was drawn

    def test_alpha_blending_partial(self):
        img = Image.new("RGB", (100, 100), (0, 0, 255))
        out = blend_shape(
            img, "mask", (10, 10, 90, 90), [[10, 10, 90, 10, 90, 90, 10, 90]],
            (255, 0, 0), random.Random(0), alpha=128,
        )
        arr = np.asarray(out)
        center = arr[50, 50]
        assert 100 < center[0] < 160  # red partially blended
        assert 100 < center[2] < 160  # blue still visible

    def test_seeded_rng_reproducible(self):
        img = Image.new("RGB", (100, 100), (0, 0, 0))
        a = blend_shape(img, "scribble", (10, 10, 90, 90), None, (0, 255, 0), random.Random(7))
        b = blend_shape(img, "scribble", (10, 10, 90, 90), None, (0, 255, 0), random.Random(7))
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestText:
    def test_collect_entity_indices(self):
        corpora = [["Why", "is", [0, 2], "here"], [["no"]], [[1], "and", [0]]]
        # Note: [["no"]] has a str inside a list — not an entity list of ints;
        # the reference treats any list as indices, so keep ints only here.
        corpora = [["Why", "is", [0, 2], "here"], [[1], "and", [0]]]
        assert text.collect_entity_indices(corpora) == [0, 1, 2]

    def test_assign_unique_shape_color_pairs(self):
        rng = random.Random(0)
        res = text.assign_shapes_and_colors(
            list(range(6)), ("rectangle",), list(COLOR_POOL.items()), rng
        )
        pairs = [(v[0], v[2]) for v in res.values()]
        named = [p for p in pairs if p[0] is not None]
        assert len(set(named)) == len(named)  # no duplicate (color, shape)

    def test_rewrite_entity_tags(self):
        rng = random.Random(0)
        assignments = {0: ("red", (255, 0, 0), "rectangle")}
        out = text.rewrite_entity_tags(
            [["Why", "is", [0], "smiling", "?"]], assignments, ["person"], rng, "direct"
        )[0]
        assert out.startswith("Why is the person within")
        assert "red rectangle" in out
        # No space before punctuation tokens.
        assert out.endswith("smiling?")

    def test_multiple_choice_block(self):
        block = text.multiple_choice_block("Q?", ["a", "b", "c", "d"])
        assert "A. a" in block and "D. d" in block
        assert block.endswith("directly.")
        with pytest.raises(ValueError):
            text.multiple_choice_block("Q?", ["a"])

    def test_build_answer_multiple_choice_contains_letter(self):
        rng = random.Random(0)
        for idx in range(4):
            ans = text.build_answer(idx, "Some content here", True, rng)
            assert f"({'ABCD'[idx]})" in ans

    def test_build_question_plain_vs_mc(self):
        rng = random.Random(0)
        q = text.build_question("What?", ["a", "b", "c", "d"], False, rng)
        assert q.startswith("<image>\n") and q.endswith("What?")
        qm = text.build_question("What?", ["a", "b", "c", "d"], True, rng)
        assert "(A) a" in qm and "(D) d" in qm


@pytest.mark.skipif(not os.path.exists(VCR_JSON), reason="reference fixture unavailable")
class TestVcrPipeline:
    @pytest.fixture(scope="class")
    def record(self):
        return json.load(open(VCR_JSON))[0]

    @pytest.fixture(scope="class")
    def image(self, record):
        return Image.open(os.path.join(VCR_IMAGES, record["image"])).convert("RGB")

    def test_supports(self, record):
        assert supports(record["id"])
        assert not supports("coco-123")
        assert not supports(42)

    def test_eval_qa_style(self, record, image):
        out_img, convs = visual_prompt_process(
            record, image, image_folder=VCR_IMAGES,
            visual_prompt_style="vcr_qa", rng=random.Random(0),
        )
        assert out_img.size == image.size
        assert len(convs) == 2
        assert convs[0]["value"].startswith("<image>\n")
        assert "Answer with the option's letter" in convs[0]["value"]
        assert convs[1]["value"] in "ABCD"
        # Overlay changed pixels.
        assert not np.array_equal(np.asarray(out_img), np.asarray(image))

    def test_eval_qar_style(self, record, image):
        _, convs = visual_prompt_process(
            record, image, image_folder=VCR_IMAGES,
            visual_prompt_style="vcr_qar", rng=random.Random(0),
        )
        assert "rationale" in convs[0]["value"]
        assert convs[1]["value"] in "ABCD"

    def test_train_style_four_turns(self, record, image):
        _, convs = visual_prompt_process(
            record, image, image_folder=VCR_IMAGES, rng=random.Random(3),
        )
        assert len(convs) == 4
        assert convs[0]["value"].startswith("<image>\n")
        roles = [c["from"] for c in convs]
        assert roles == ["human", "gpt", "human", "gpt"]

    def test_train_reproducible_with_seed(self, record, image):
        a = visual_prompt_process(record, image, image_folder=VCR_IMAGES, rng=random.Random(5))
        b = visual_prompt_process(record, image, image_folder=VCR_IMAGES, rng=random.Random(5))
        assert a[1] == b[1]
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
