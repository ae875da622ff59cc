"""Device bit-packer byte-identity vs the host entropy coder.

The device stream (ops/bitpack.py) must match entropy/native.py's output
byte-for-byte for every block size / content class — encoded.bin is written
straight from the device bytes in devbits mode."""

import numpy as np
import pytest

import jax.numpy as jnp

from basic_video_codec_tpu.entropy import EOB_MARKER
from basic_video_codec_tpu.entropy.native import (
    encode_dct_plane_bytes,
    encode_symbols_bytes,
)
from basic_video_codec_tpu.entropy.rle import rle_encode_blocks
from basic_video_codec_tpu.entropy.zigzag import zigzag_indices
from basic_video_codec_tpu.ops import bitpack as B
from basic_video_codec_tpu.ops.bitlen import rle_block_bits


def _plane(rng, h, w, density, hi):
    """qdct-like plane: mostly zeros, low-frequency energy."""
    p = rng.integers(-hi, hi + 1, size=(h, w)).astype(np.int16)
    mask = rng.random((h, w)) < density
    return np.where(mask, p, 0).astype(np.int16)


def _zz_rows(q, bs):
    h, w = q.shape
    nbr, nbc = h // bs, w // bs
    blocks = (q.reshape(nbr, bs, nbc, bs).swapaxes(1, 2)
              .reshape(nbr * nbc, bs * bs))
    return blocks[:, zigzag_indices(bs)].astype(np.int32)


@pytest.mark.parametrize("bs", [8, 16])
@pytest.mark.parametrize("density,hi", [(0.0, 1), (0.05, 7), (0.3, 40),
                                        (0.95, 300)])
def test_dct_stream_byte_identity(bs, density, hi):
    rng = np.random.default_rng(hash((bs, int(density * 100), hi)) % 2**32)
    h, w = 64, 96
    q = _plane(rng, h, w, density, hi)
    z = _zz_rows(q, bs)
    nb = z.shape[0]
    # true worst case for the test: 2 slots (header+literal) per position
    # + 1 EOB per block (production caps derive from the calibrated
    # q-prefix cap and overflow-fall-back instead)
    cap = 2 * z.size + nb
    by, bits, n = B.pack_dct_bits(jnp.asarray(z), cap)
    by, bits, n = np.asarray(by), int(bits), int(n)
    ref_bytes, ref_bits = encode_dct_plane_bytes(q, bs, zigzag_indices(bs),
                                                 EOB_MARKER)
    assert bits == ref_bits
    assert n <= cap
    assert by[: (bits + 7) // 8].tobytes() == ref_bytes
    # pricing parity: the packer's total equals the RC pricing form
    assert bits == int(np.asarray(rle_block_bits(jnp.asarray(z)).sum()))


def test_dct_stream_overflow_flag():
    rng = np.random.default_rng(7)
    q = _plane(rng, 32, 32, 0.9, 200)
    z = _zz_rows(q, 8)
    by, bits, n = B.pack_dct_bits(jnp.asarray(z), 8)  # absurdly small cap
    assert int(n) > 8  # flags overflow; caller falls back


def test_symbol_stream_matches_scalar_rle():
    rng = np.random.default_rng(3)
    q = _plane(rng, 32, 48, 0.15, 9)
    z = _zz_rows(q, 8)
    ref_syms = rle_encode_blocks(z.astype(np.int64), EOB_MARKER)
    ref_bytes, ref_bits = encode_symbols_bytes(ref_syms)
    by, bits, n = B.pack_dct_bits(jnp.asarray(z), 4096)
    assert int(bits) == ref_bits
    assert np.asarray(by)[: (ref_bits + 7) // 8].tobytes() == ref_bytes


@pytest.mark.parametrize("k", [2, 3])
def test_pred_stream_inter(k):
    rng = np.random.default_rng(11 + k)
    nbr, nbc = 6, 8
    nb = nbr * nbc
    mv = rng.integers(-33, 34, size=(nb, 3)).astype(np.int32)
    if k == 2:
        mv[:, 2] = 0
    row_qps = rng.integers(0, 10, size=nbr).astype(np.int32)
    qp0 = 4
    # host form (models/pipeline._finalize_fields)
    prev = np.vstack([np.zeros(3, np.int64), mv.astype(np.int64)[:-1]])
    diffs = (mv.astype(np.int64) - prev)[:, :k].reshape(nbr, nbc * k)
    syms = np.hstack([(row_qps.astype(np.int64) - qp0)[:, None], diffs]).ravel()
    ref_bytes, ref_bits = encode_symbols_bytes(syms)

    dev = B.pred_syms_inter(jnp.asarray(row_qps), qp0,
                            jnp.asarray(mv.reshape(-1)), nbr, k)
    by, bits = B.pack_pred_bits(dev)
    assert int(bits) == ref_bits
    assert np.asarray(by)[: (ref_bits + 7) // 8].tobytes() == ref_bytes


def test_pred_stream_intra():
    rng = np.random.default_rng(5)
    nbr, nbc = 5, 7
    modes = rng.integers(0, 2, size=(nbr, nbc)).astype(np.int32)
    row_qps = rng.integers(0, 11, size=nbr).astype(np.int32)
    qp0 = 6
    syms = np.hstack([(row_qps.astype(np.int64) - qp0)[:, None],
                      modes.astype(np.int64)]).ravel()
    ref_bytes, ref_bits = encode_symbols_bytes(syms)
    dev = B.pred_syms_intra(jnp.asarray(row_qps), qp0, jnp.asarray(modes))
    by, bits = B.pack_pred_bits(dev)
    assert int(bits) == ref_bits
    assert np.asarray(by)[: (ref_bits + 7) // 8].tobytes() == ref_bytes


def test_pred_stream_masked_rows():
    """Runtime-mode rows pad intra symbol rows to the inter shape with
    masked (zero-length) slots — the packed bytes must equal the unpadded
    stream."""
    rng = np.random.default_rng(9)
    nbr, nbc, k = 4, 6, 2
    modes = rng.integers(0, 2, size=(nbr, nbc)).astype(np.int32)
    row_qps = rng.integers(0, 9, size=nbr).astype(np.int32)
    dense = B.pred_syms_intra(jnp.asarray(row_qps), 3, jnp.asarray(modes))
    by_ref, bits_ref = B.pack_pred_bits(dense)
    # pad each row to 1 + nbc*k with masked slots
    pad = np.zeros((nbr, 1 + nbc * k), np.int32)
    pad[:, : 1 + nbc] = np.asarray(dense)
    mask = np.zeros((nbr, 1 + nbc * k), bool)
    mask[:, : 1 + nbc] = True
    by, bits = B.pack_pred_bits(jnp.asarray(pad), jnp.asarray(mask))
    assert int(bits) == int(bits_ref)
    nbytes = (int(bits) + 7) // 8
    assert np.asarray(by)[:nbytes].tobytes() == np.asarray(by_ref)[:nbytes].tobytes()
