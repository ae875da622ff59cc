"""Golden transform/quantization stage (reference encoder/dct.py semantics).

The reference computes a separable float32 DCT-II/III via
``scipy.fftpack.dct/idct(norm='ortho')`` (dct.py:9-18); the golden model calls
the same routine so its floats are bit-identical to the reference's.  The
device path (ops/transform.py) computes the same transform as MXU matmuls —
see there for the equivalence/tolerance discussion.
"""

import numpy as np
from scipy.fftpack import dct as _dct, idct as _idct


def apply_dct_2d(block: np.ndarray) -> np.ndarray:
    """Separable 2D DCT-II, float32 (reference dct.py:9-12)."""
    block = block.astype(np.float32)
    return _dct(_dct(block.T, norm="ortho").T, norm="ortho")


def apply_idct_2d(block: np.ndarray) -> np.ndarray:
    """Separable 2D inverse DCT, float32 (reference dct.py:15-18)."""
    block = block.astype(np.float32)
    return _idct(_idct(block.T, norm="ortho").T, norm="ortho")


def generate_quantization_matrix(i: int, qp: int) -> np.ndarray:
    """Power-of-two quant matrix (reference dct.py:21-32):
    ``2^qp`` below the anti-diagonal, ``2^(qp+1)`` on it, ``2^(qp+2)`` above."""
    xy = np.add.outer(np.arange(i), np.arange(i))
    Q = np.where(xy < i - 1, 2 ** qp, np.where(xy == i - 1, 2 ** (qp + 1), 2 ** (qp + 2)))
    return Q.astype(np.uint16)


def quantize_block(dct_block: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """``round(dct / Q)`` with banker's rounding (reference dct.py:35-37)."""
    return np.round(dct_block / Q)


def rescale_block(quantized_block: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """``q * Q`` (reference dct.py:40-42)."""
    return quantized_block * Q


def apply_dct_and_quantization(residual_block: np.ndarray, block_size: int, qp: int):
    """DCT -> quantize (reference Frame.py:190-194)."""
    coffs = apply_dct_2d(residual_block)
    Q = generate_quantization_matrix(block_size, qp)
    return quantize_block(coffs, Q), Q


def reconstruct_block(quantized_dct_coffs, Q, predicted_block):
    """rescale -> IDCT -> +pred -> round -> clip to uint8
    (reference Frame.py:197-202)."""
    idct_residual = apply_idct_2d(rescale_block(quantized_dct_coffs, Q))
    recon = np.round(idct_residual + predicted_block).astype(np.int16)
    return np.clip(recon, 0, 255).astype(np.uint8), idct_residual
