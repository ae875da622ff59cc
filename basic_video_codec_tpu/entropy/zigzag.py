"""Zigzag scan order over square blocks.

Matches the reference's diagonal traversal exactly
(encoder/entropy_encoder.py:115-160): diagonal ``s`` visits ``(i, s-i)`` for
``i`` ascending when ``s`` is even and ``(s-i, i)`` when ``s`` is odd.

Instead of nested Python loops per block, this module precomputes the
permutation once per block size; both the host layer and the device kernels
then zigzag a whole frame's blocks with a single gather.
"""

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def zigzag_indices(n: int) -> np.ndarray:
    """Flat gather indices: ``block.ravel()[zigzag_indices(n)]`` is the scan."""
    order = []
    for s in range(2 * n - 1):
        for i in range(s + 1):
            if s % 2 == 0:
                r, c = i, s - i
            else:
                r, c = s - i, i
            if r < n and c < n:
                order.append(r * n + c)
    return np.asarray(order, dtype=np.int64)


@lru_cache(maxsize=None)
def inverse_zigzag_indices(n: int) -> np.ndarray:
    """Scatter indices: ``flat[inverse] = scan`` reconstructs the block."""
    idx = zigzag_indices(n)
    inv = np.empty_like(idx)
    inv[idx] = np.arange(idx.shape[0], dtype=np.int64)
    return inv


def zigzag_order(matrix) -> list:
    """Scan one square block (reference entropy_encoder.py:115-135 signature)."""
    m = np.asarray(matrix)
    n = m.shape[0]
    return list(m.ravel()[zigzag_indices(n)])


def inverse_zigzag_order(arr, n: int):
    """Rebuild an ``n x n`` block from its scan (entropy_encoder.py:138-160)."""
    flat = np.zeros(n * n, dtype=np.asarray(arr).dtype if len(arr) else np.int64)
    flat[zigzag_indices(n)] = np.asarray(arr)
    return flat.reshape(n, n)
