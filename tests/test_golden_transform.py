"""Golden transform/quant tests (model: reference tests/test_dct.py intent)."""

import numpy as np
import pytest

from basic_video_codec_tpu.golden import dct as gdct


class TestQuantMatrix:
    def test_values_4_2(self):
        Q = gdct.generate_quantization_matrix(4, 2)
        expected = np.array(
            [[4, 4, 4, 8], [4, 4, 8, 16], [4, 8, 16, 16], [8, 16, 16, 16]],
            dtype=np.uint16,
        )
        assert np.array_equal(Q, expected)
        assert Q.dtype == np.uint16

    def test_values_2_0(self):
        Q = gdct.generate_quantization_matrix(2, 0)
        assert np.array_equal(Q, np.array([[1, 2], [2, 4]], dtype=np.uint16))


class TestTransformRoundTrip:
    @pytest.mark.parametrize("bs,qp", [(4, 2), (8, 0), (8, 4), (16, 3), (16, 11)])
    def test_quantize_rescale_inverse_tolerance(self, bs, qp):
        rng = np.random.default_rng(bs * 100 + qp)
        block = rng.integers(-255, 256, size=(bs, bs)).astype(np.int16)
        qcoffs, Q = gdct.apply_dct_and_quantization(block, bs, qp)
        recon_residual = gdct.apply_idct_2d(gdct.rescale_block(qcoffs, Q))
        # quantization error per coefficient is at most Q/2 <= 2^(qp+1)
        assert np.allclose(recon_residual, block, atol=2 ** (qp + 2))

    def test_dct_orthonormal(self):
        rng = np.random.default_rng(7)
        block = rng.integers(-255, 256, size=(8, 8)).astype(np.int16)
        back = gdct.apply_idct_2d(gdct.apply_dct_2d(block))
        assert np.allclose(back, block, atol=1e-3)

    def test_reconstruct_block_clips_uint8(self):
        block = np.full((8, 8), 255, dtype=np.int16)
        qcoffs, Q = gdct.apply_dct_and_quantization(block, 8, 0)
        pred = np.full((8, 8), 200, dtype=np.int16)
        recon, _ = gdct.reconstruct_block(qcoffs, Q, pred)
        assert recon.dtype == np.uint8
        assert recon.max() == 255
