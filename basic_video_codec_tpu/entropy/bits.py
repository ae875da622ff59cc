"""Minimal bit-stream containers.

The reference uses the C-backed ``bitarray`` package; this framework keeps all
bulk bit manipulation vectorized in NumPy (``np.packbits``/``np.unpackbits``)
so a whole frame's bitstream is materialized in a handful of array ops instead
of per-bit appends (reference encoder/Frame.py:69-75 appends bit-by-bit).
"""

import numpy as np


class BitWriter:
    """Append-only bit buffer.

    Accumulates uint8 0/1 chunks and packs once at the end.  ``__len__`` is the
    bit length (the reference rate controller budgets on exact bit counts,
    encoder/IFrame.py:63-70).
    """

    __slots__ = ("_chunks", "_nbits")

    def __init__(self):
        self._chunks: list[np.ndarray] = []
        self._nbits = 0

    def extend(self, bits: np.ndarray):
        self._chunks.append(bits)
        self._nbits += bits.shape[0]

    def __len__(self) -> int:
        return self._nbits

    def bits(self) -> np.ndarray:
        if not self._chunks:
            return np.zeros(0, dtype=np.uint8)
        if len(self._chunks) > 1:
            self._chunks = [np.concatenate(self._chunks)]
        return self._chunks[0]

    def tobytes(self) -> bytes:
        """Pack to bytes, zero-padding the final byte (bitarray.tobytes parity)."""
        return np.packbits(self.bits()).tobytes()

    def nbytes(self) -> int:
        """Ceil byte length (reference encoder/encoder.py:108)."""
        return (self._nbits + 7) // 8


class BitReader:
    """Sequential reader over a packed byte buffer."""

    __slots__ = ("_bits", "_pos")

    def __init__(self, data: bytes | np.ndarray):
        if isinstance(data, np.ndarray) and data.dtype == np.uint8 and data.ndim == 1:
            buf = data
        else:
            buf = np.frombuffer(bytes(data), dtype=np.uint8)
        self._bits = np.unpackbits(buf)
        self._pos = 0

    def remaining(self) -> int:
        return self._bits.shape[0] - self._pos

    def bits_from(self) -> np.ndarray:
        """View of the remaining bits (for vectorized symbol decoding)."""
        return self._bits[self._pos:]

    def advance(self, n: int):
        self._pos += n
