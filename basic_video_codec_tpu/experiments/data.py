"""Synthetic stand-ins for the reference's (unhydrated LFS) data assets.

The reference bundles foreman_cif.yuv / e3_CIF.y / e3_QCIF.y; this module
materializes deterministic synthetic sequences with matching geometry so
every experiment runs out of the box, and uses the real files when present.
"""

import os

import numpy as np

from ..tools import ygen

CIF = (352, 288)
QCIF = (176, 144)


def ensure_sequence(path: str, width: int, height: int, n_frames: int, seed: int = 7) -> str:
    """Return ``path``, generating a synthetic .y sequence if missing."""
    if os.path.exists(path) and os.path.getsize(path) >= width * height * n_frames:
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ygen.write_y_file(path, ygen.moving_sequence(width, height, n_frames, seed=seed))
    return path


def ensure_yuv420(path: str, width: int, height: int, n_frames: int, seed: int = 7) -> str:
    """Synthetic YUV420 file (Y from the moving sequence, flat-ish chroma)."""
    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    ys = ygen.moving_sequence(width, height, n_frames, seed=seed)
    rng = np.random.default_rng(seed)
    with open(path, "wb") as f:
        for y in ys:
            f.write(y.tobytes())
            u = np.full((height // 2, width // 2), 120, np.uint8)
            v = np.full((height // 2, width // 2), 132, np.uint8)
            u = (u + rng.integers(-3, 4, u.shape)).astype(np.uint8)
            v = (v + rng.integers(-3, 4, v.shape)).astype(np.uint8)
            f.write(u.tobytes())
            f.write(v.tobytes())
    return path
