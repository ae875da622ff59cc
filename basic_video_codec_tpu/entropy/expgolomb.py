"""Signed exponential-Golomb coding.

Bit-compatible with the reference (encoder/entropy_encoder.py:8-62):

* signed map: ``v <= 0 -> -2v``, ``v > 0 -> 2v - 1`` (entropy_encoder.py:12)
* codeword for mapped value ``m``: ``(n-1)`` zero bits followed by the ``n``-bit
  binary representation of ``m + 1`` where ``n = (m+1).bit_length()``.
  (The reference builds the leading zeros from an *uninitialized*
  ``bitarray(n)``, entropy_encoder.py:26, which is zeroed only by allocator
  luck; we emit explicit zeros.)
* decoder: on hitting end-of-stream while counting leading zeros, treat <8
  trailing bits as byte padding and return ``(None, None)``; 8+ bits raise
  ``ValueError`` (entropy_encoder.py:39-45).

On top of the scalar codec this module provides vectorized NumPy paths that
encode / measure a whole frame's symbol stream at once — these feed the host
finalization layer, while the *device* computes the same closed-form lengths
for rate control (see ops/bitlen.py).
"""

import numpy as np

_signed_dtype = np.int64


def _map_signed(value):
    """Signed -> non-negative mapping (reference entropy_encoder.py:12)."""
    return -2 * value if value <= 0 else 2 * value - 1


def exp_golomb_encode(value: int) -> np.ndarray:
    """Codeword for a signed int as a uint8 0/1 array."""
    x = _map_signed(int(value)) + 1
    n = x.bit_length()
    out = np.zeros(2 * n - 1, dtype=np.uint8)
    for i in range(n):
        out[n - 1 + i] = (x >> (n - 1 - i)) & 1
    return out


def exp_golomb_length(value: int) -> int:
    """Closed-form codeword bit length: ``2*bitlen(mapped+1) - 1``."""
    x = _map_signed(int(value)) + 1
    return 2 * x.bit_length() - 1


def exp_golomb_decode(bits: np.ndarray, pos: int = 0):
    """Decode one symbol from ``bits`` starting at ``pos``.

    Returns ``(value, next_pos)``; ``(None, None)`` on <8 trailing padding
    bits, ``ValueError`` otherwise (reference entropy_encoder.py:32-62).
    """
    n = bits.shape[0]
    m = 0
    while pos + m < n and not bits[pos + m]:
        m += 1
    if pos + m >= n:
        if n - pos < 8:
            return None, None
        raise ValueError("Not enough bits to decode the exp-Golomb code (prefix error).")
    value = 1
    for i in range(1, m + 1):
        value = (value << 1) | int(bits[pos + m + i])
    value -= 1
    decoded = -(value // 2) if value % 2 == 0 else (value + 1) // 2
    return decoded, pos + 2 * m + 1


# ---------------------------------------------------------------------------
# Vectorized paths
# ---------------------------------------------------------------------------

# Codewords top out at EOB (8190 -> mapped+1 = 16380, 14 bits -> 27-bit code);
# quantized DCT coefficients stay well below that (|coeff| <= bs*255 rounded).
_MAX_CODE_BITS = 63


def _mapped_plus_one(symbols: np.ndarray) -> np.ndarray:
    s = symbols.astype(_signed_dtype)
    return np.where(s <= 0, -2 * s, 2 * s - 1) + 1


def _bit_length(x: np.ndarray) -> np.ndarray:
    """Exact integer bit length (no float log2 rounding hazards)."""
    x = x.astype(np.uint64)
    n = np.zeros(x.shape, dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):  # binary reduction
        hi = x >> np.uint64(s)
        has_hi = hi > 0
        n += np.where(has_hi, s, 0)
        x = np.where(has_hi, hi, x)
    return n + (x > 0)


def symbols_bit_length(symbols: np.ndarray) -> np.ndarray:
    """Per-symbol codeword lengths, vectorized: ``2*bitlen(mapped+1) - 1``."""
    return 2 * _bit_length(_mapped_plus_one(np.asarray(symbols))) - 1


def symbols_to_bits(symbols: np.ndarray) -> np.ndarray:
    """Concatenated codewords of a symbol vector as one uint8 0/1 array.

    Builds an ``[n, W]`` bit matrix (W = max codeword width in this batch) plus
    a validity mask and compresses it in order — one shot for an entire frame.
    """
    symbols = np.asarray(symbols)
    if symbols.size == 0:
        return np.zeros(0, dtype=np.uint8)
    x = _mapped_plus_one(symbols)  # [n]
    nbits = _bit_length(x)  # value bits; codeword = (nbits-1) zeros + nbits value bits
    width = 2 * nbits - 1
    wmax = int(width.max())
    # bit j of the codeword (j in [0, wmax)): zero while j < nbits-1, then the
    # value bits MSB-first: bit index from MSB = j - (nbits - 1)
    j = np.arange(wmax, dtype=np.int64)[None, :]
    shift = (width[:, None] - 1 - j)  # >=0 inside the codeword
    valid = j < width[:, None]
    shift = np.maximum(shift, 0)
    bits = ((x[:, None] >> shift) & 1).astype(np.uint8)
    return bits[valid]


def decode_symbols(bits: np.ndarray, max_symbols: int | None = None):
    """Decode consecutive exp-Golomb symbols until the stream is exhausted.

    Pure-Python scan (the C++ entropy backend supersedes this on the hot
    path).  Mirrors the reference's tail-padding tolerance.
    """
    out = []
    pos = 0
    n = bits.shape[0]
    while pos < n:
        val, nxt = exp_golomb_decode(bits, pos)
        if nxt is None:
            break
        out.append(val)
        pos = nxt
        if max_symbols is not None and len(out) >= max_symbols:
            break
    return out, pos
