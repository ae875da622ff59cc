"""Golden motion-estimation tests (model: reference tests/test_encoder.py intent:
plant a marker, roll the frame, assert the recovered MV equals the translation)."""

import numpy as np
import pytest

from basic_video_codec_tpu.config import EncoderConfig
from basic_video_codec_tpu.golden import me as gme
from basic_video_codec_tpu.golden.interp import build_pre_interpolated_buffer
from basic_video_codec_tpu.tools import ygen


def _setup(ref_frame):
    return [ref_frame], [build_pre_interpolated_buffer(ref_frame)]


class TestFullSearch:
    @pytest.mark.parametrize("dx,dy", [(0, 0), (2, 0), (0, -3), (-2, 2), (4, 4)])
    def test_recovers_translation(self, dx, dy):
        ec = EncoderConfig(block_size=8, search_range=4, I_Period=8, quantization_factor=0)
        ref = ygen.textured_frame(64, 48, seed=1)
        curr = np.roll(np.roll(ref, dy, axis=0), dx, axis=1)
        refs, irefs = _setup(ref)
        origin = (24, 24)  # interior block so the window is fully in range
        block = curr[24:32, 24:32].astype(np.int16)
        mv, best_mae, _ = gme.full_search(block, origin, refs, irefs, ec)
        # content rolled right/down by (dx, dy) matches the reference at -(dx, dy)
        assert (mv[0], mv[1]) == (-dx, -dy)
        assert best_mae == 0.0

    def test_tie_breaks_prefer_smaller_l1(self):
        ec = EncoderConfig(block_size=8, search_range=2, I_Period=8, quantization_factor=0)
        ref = np.full((32, 32), 100, dtype=np.uint8)  # flat: every candidate ties
        refs, irefs = _setup(ref)
        block = np.full((8, 8), 100, dtype=np.int16)
        mv, best_mae, comparisons = gme.full_search(block, (8, 8), refs, irefs, ec)
        assert (mv[0], mv[1]) == (0, 0)
        assert best_mae == 0.0
        assert comparisons == 25

    def test_out_of_range_candidates_skipped(self):
        ec = EncoderConfig(block_size=8, search_range=4, I_Period=8, quantization_factor=0)
        ref = ygen.textured_frame(32, 32, seed=2)
        refs, irefs = _setup(ref)
        block = ref[0:8, 0:8].astype(np.int16)
        mv, best_mae, _ = gme.full_search(block, (0, 0), refs, irefs, ec)
        assert (mv[0], mv[1]) == (0, 0)
        assert best_mae == 0.0


class TestFastSearch:
    @pytest.mark.parametrize("dx,dy", [(0, 0), (1, 0), (3, 2), (-2, -1)])
    def test_recovers_small_translation(self, dx, dy):
        ec = EncoderConfig(
            block_size=8, search_range=4, I_Period=8, quantization_factor=0, fastME=True
        )
        ref = ygen.textured_frame(64, 64, seed=4)
        curr = np.roll(np.roll(ref, dy, axis=0), dx, axis=1)
        refs, irefs = _setup(ref)
        block = curr[24:32, 24:32].astype(np.int16)
        mv, best_mae, comps = gme.fast_search(block, (24, 24), (0, 0), refs, irefs, ec)
        assert (mv[0], mv[1]) == (-dx, -dy)
        assert best_mae == 0.0
        assert comps > 0


class TestHalfPel:
    def test_interpolation_values(self):
        f = np.array([[0, 10], [20, 40]], dtype=np.uint8)
        buf = build_pre_interpolated_buffer(f)
        assert buf.shape == (4, 4)
        assert buf[0, 0] == 0 and buf[0, 2] == 10
        assert buf[0, 1] == 5       # ceil((0+10)/2)
        assert buf[1, 0] == 10      # ceil((0+20)/2)
        assert buf[1, 1] == 18      # ceil((0+10+20+40)/4) = ceil(17.5)
        assert buf[1, 2] == 25      # ceil((10+40)/2)
        # last interpolated row/col have no neighbour -> stay 0
        assert buf[3, 3] == 0 and buf[0, 3] == 0 and buf[3, 0] == 0

    def test_frac_me_recovers_half_pel_shift(self):
        ec = EncoderConfig(
            block_size=8, search_range=2, I_Period=8, quantization_factor=0,
            fracMeEnabled=True,
        )
        ref = ygen.textured_frame(64, 48, seed=5)
        refs, irefs = _setup(ref)
        # current block = the half-pel interpolated block at offset (+1, 0) in
        # half-pel units from (24, 24)
        cand = gme.get_ref_block_at_mv(ref, irefs[0], (24, 24), 1, 0, ec)
        mv, best_mae, _ = gme.full_search(cand.astype(np.int16), (24, 24), refs, irefs, ec)
        assert (mv[0], mv[1]) == (1, 0)
        assert best_mae == 0.0
