"""Golden tests for anyres geometry — values checked against the reference
algorithm in vis_zephyr/model/multi_scale_process.py."""

import pytest

from vis_zephyr_tpu.data import anyres


PINPOINTS = [(336, 672), (672, 336), (336, 1008), (1008, 336)]


class TestSelectBestFitResolution:
    @pytest.mark.parametrize(
        "original,expected",
        [
            ((640, 480), (672, 336)),     # landscape → 2x1 grid
            ((480, 640), (336, 672)),     # portrait → 1x2 grid
            ((1920, 1080), (672, 336)),
            ((1080, 1920), (336, 672)),
            ((2000, 500), (1008, 336)),   # very wide → 3x1
            ((500, 2000), (336, 1008)),
            ((336, 336), (336, 672)),     # square ties → first candidate listed
            ((100, 100), (336, 672)),
        ],
    )
    def test_golden(self, original, expected):
        assert anyres.select_best_fit_resolution(original, PINPOINTS) == expected

    def test_matches_reference_algorithm_exhaustively(self):
        # Re-derive with an independent brute-force oracle on a size sweep.
        def oracle(orig, cands):
            ow, oh = orig
            best, best_eff, best_waste = None, 0, float("inf")
            for w, h in cands:
                scale = min(w / ow, h / oh)
                eff = min(int(ow * scale) * int(oh * scale), ow * oh)
                waste = w * h - eff
                if eff > best_eff or (eff == best_eff and waste < best_waste):
                    best, best_eff, best_waste = (w, h), eff, waste
            return best

        for ow in range(50, 1400, 97):
            for oh in range(50, 1400, 103):
                assert anyres.select_best_fit_resolution((ow, oh), PINPOINTS) == oracle(
                    (ow, oh), PINPOINTS
                )


class TestGeometry:
    def test_resize_pad_geometry(self):
        (nw, nh), (px, py) = anyres.resize_pad_geometry((640, 480), (672, 336))
        assert (nw, nh) == (448, 336)
        assert (px, py) == ((672 - 448) // 2, 0)

    def test_tile_boxes_row_major(self):
        boxes = anyres.tile_boxes((672, 336), 336)
        assert boxes == [(0, 0, 336, 336), (336, 0, 672, 336)]
        boxes = anyres.tile_boxes((336, 672), 336)
        assert boxes == [(0, 0, 336, 336), (0, 336, 336, 672)]

    def test_grid_shape(self):
        assert anyres.calculate_grid_shape((640, 480), PINPOINTS, 336) == (2, 1)
        assert anyres.calculate_grid_shape((480, 640), PINPOINTS, 336) == (1, 2)
        assert anyres.calculate_grid_shape((2000, 500), PINPOINTS, 336) == (3, 1)

    def test_num_patches(self):
        assert anyres.num_anyres_patches((640, 480), PINPOINTS, 336) == 3  # global + 2
        assert anyres.num_anyres_patches((2000, 500), PINPOINTS, 336) == 4

    def test_max_patches_static_bound(self):
        assert anyres.max_anyres_patches(PINPOINTS, 336) == 4

    def test_pinpoints_string_parsing(self):
        # Doubly-quoted strings as shipped through shell scripts.
        s = "'[[336, 672], [672, 336], [336, 1008], [1008, 336]]'"
        assert anyres.parse_grid_pinpoints(s) == PINPOINTS
        assert anyres.parse_grid_pinpoints(str(list(map(list, PINPOINTS)))) == PINPOINTS
        assert anyres.parse_grid_pinpoints(PINPOINTS) == PINPOINTS


class TestUnpadSlice:
    def test_wider_original_crops_height(self):
        # Feature map 24x48 (w x h), original 640x480 (4:3 wider than 1:2).
        ws, hs = anyres.unpad_slice((640, 480), (24, 48))
        assert ws == slice(None)
        new_h = int(480 * (24 / 640))
        pad = (48 - new_h) // 2
        assert hs == slice(pad, 48 - pad)

    def test_taller_original_crops_width(self):
        ws, hs = anyres.unpad_slice((480, 640), (48, 24))
        assert hs == slice(None)
        new_w = int(480 * (24 / 640))
        pad = (48 - new_w) // 2
        assert ws == slice(pad, 48 - pad)
