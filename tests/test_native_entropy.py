"""Native (C) entropy codec vs the Python/NumPy reference implementations."""

import numpy as np
import pytest

from basic_video_codec_tpu.entropy import (
    EOB_MARKER,
    rle_encode_blocks,
    symbols_to_bits,
)
from basic_video_codec_tpu.entropy import native


needs_native = pytest.mark.skipif(not native.available(), reason="no native codec")


@needs_native
class TestNativeCodec:
    def test_encode_matches_numpy(self):
        rng = np.random.default_rng(0)
        syms = rng.integers(-5000, 5001, size=2000)
        syms[::7] = EOB_MARKER
        data, nbits = native.encode_symbols_bytes(syms)
        bits = symbols_to_bits(syms)
        assert nbits == bits.shape[0]
        assert data == np.packbits(bits).tobytes()

    def test_decode_round_trip(self):
        rng = np.random.default_rng(1)
        syms = rng.integers(-300, 301, size=1500)
        data, _ = native.encode_symbols_bytes(syms)
        out = native.decode_symbols_np(data, syms.size)
        assert np.array_equal(out, syms)

    def test_decode_stops_at_padding(self):
        syms = np.array([7, -7, 0, 8190], dtype=np.int64)
        data, _ = native.encode_symbols_bytes(syms)
        out = native.decode_symbols_np(data, 100)
        assert out.tolist() == syms.tolist()

    def test_decode_dct_scans_round_trip(self):
        rng = np.random.default_rng(2)
        L, n_blocks = 64, 50
        scans = (rng.integers(-40, 41, size=(n_blocks, L))
                 * (rng.random((n_blocks, L)) < 0.3)).astype(np.int64)
        symbol_stream = rle_encode_blocks(scans, EOB_MARKER)
        data, _ = native.encode_symbols_bytes(symbol_stream)
        out = native.decode_dct_scans(data, n_blocks, L, EOB_MARKER)
        assert np.array_equal(out, scans)

    def test_all_zero_and_dense_blocks(self):
        L, n = 64, 4
        scans = np.zeros((n, L), dtype=np.int64)
        scans[1] = 1  # fully dense
        scans[2, :3] = [5, 0, -5]
        stream = rle_encode_blocks(scans, EOB_MARKER)
        data, _ = native.encode_symbols_bytes(stream)
        out = native.decode_dct_scans(data, n, L, EOB_MARKER)
        assert np.array_equal(out, scans)


def test_fallback_paths_match_native_or_numpy():
    """The fallback implementations agree with whichever path is active."""
    rng = np.random.default_rng(3)
    syms = rng.integers(-100, 101, size=400)
    data, nbits = native.encode_symbols_bytes(syms)
    bits = symbols_to_bits(syms)
    assert nbits == bits.shape[0]
    assert np.array_equal(native.decode_symbols_np(data, syms.size), syms)
