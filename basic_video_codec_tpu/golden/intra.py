"""Golden intra prediction (reference encoder/IFrame.py:174-213 semantics).

Two observable quirks are reproduced deliberately:

* **Transposed predictors** (IFrame.py:198-213).  The reference's "horizontal"
  prediction tiles the left column as *rows*, i.e. ``H[i, j] = recon[y+j, x-1]``
  (a classical horizontal predictor would use ``recon[y+i, x-1]``), and its
  "vertical" prediction is ``V[i, j] = recon[y-1, x+i]``.  Encoder and decoder
  share the quirk, so streams round-trip.

* **uint8 wraparound in the mode decision** (IFrame.py:189-190).  The MAE used
  to pick horizontal vs vertical subtracts two uint8 arrays (mod-256 wrap)
  when a real neighbour exists, but promotes to int64 (no wrap) at picture
  borders where the predictor is ``np.full(..., 128)``.
"""

import numpy as np


def horizontal_pred(recon: np.ndarray, x: int, y: int, bs: int) -> np.ndarray:
    if x > 0:
        left = recon[y : y + bs, x - 1]  # column, length bs
        return np.tile(left, (bs, 1))  # H[i, j] = left[j]  (quirk)
    return np.full((bs, bs), 128)  # int64 at borders (quirk)


def vertical_pred(recon: np.ndarray, x: int, y: int, bs: int) -> np.ndarray:
    if y > 0:
        top = recon[y - 1, x : x + bs]  # row, length bs
        return np.tile(top, (bs, 1)).T  # V[i, j] = top[i]  (quirk)
    return np.full((bs, bs), 128)


def select_intra_mode(curr_block: np.ndarray, recon: np.ndarray, x: int, y: int, bs: int):
    """Pick H (0) vs V (1) by lower wraparound-MAE (reference IFrame.py:184-195)."""
    h = horizontal_pred(recon, x, y, bs)
    v = vertical_pred(recon, x, y, bs)
    # curr_block is a uint8 view; subtraction wraps when the predictor is uint8.
    mae_h = np.mean(np.abs(curr_block - h))
    mae_v = np.mean(np.abs(curr_block - v))
    if mae_h < mae_v:
        return h, 0, mae_h
    return v, 1, mae_v


def predict_for_mode(mode: int, recon: np.ndarray, x: int, y: int, bs: int) -> np.ndarray:
    """Decoder-side predictor dispatch (reference IFrame.py:174-181)."""
    if mode == 0:
        return horizontal_pred(recon, x, y, bs)
    if mode == 1:
        return vertical_pred(recon, x, y, bs)
    raise ValueError(f"Invalid prediction mode [{mode}]: must be 0 (horizontal) or 1 (vertical).")
