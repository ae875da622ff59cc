"""Golden half-pel interpolation buffer (reference block_predictor.py:145-177).

Semantics preserved exactly, computed vectorized instead of per-pixel Python:

* even/even positions hold the original samples,
* odd positions hold the **ceil** of the 2- or 4-neighbour mean
  (``np.ceil((a+b)/2)``; integer form ``(a+b+1)//2`` / ``(a+b+c+d+3)//4``),
* the last interpolated column/row (no right/bottom neighbour) stays 0.
"""

import numpy as np


def build_pre_interpolated_buffer(reference_frame: np.ndarray) -> np.ndarray:
    f = reference_frame.astype(np.int32)
    h, w = f.shape
    out = np.zeros((2 * h, 2 * w), dtype=np.uint8)

    out[0::2, 0::2] = f
    # horizontal half-pels: ceil((f[y,x] + f[y,x+1]) / 2)
    out[0::2, 1 : 2 * w - 1 : 2] = (f[:, :-1] + f[:, 1:] + 1) // 2
    # vertical half-pels
    out[1 : 2 * h - 1 : 2, 0::2] = (f[:-1, :] + f[1:, :] + 1) // 2
    # diagonal half-pels: ceil(4-neighbour mean)
    out[1 : 2 * h - 1 : 2, 1 : 2 * w - 1 : 2] = (
        f[:-1, :-1] + f[:-1, 1:] + f[1:, :-1] + f[1:, 1:] + 3
    ) // 4
    return out
