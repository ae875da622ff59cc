"""Raw video I/O: ``.yuv`` (YUV420 planar) and ``.y`` (luma-only) files.

Covers the reference's preprocessing path (assign1/ex2.py:14-46): extract the
Y plane from YUV420 and write ``.y`` files, plus batched/streaming readers
sized for feeding frames to the device.
"""

import os

import numpy as np


def iter_y_frames(path: str, width: int, height: int, max_frames: int | None = None):
    """Yield uint8 ``[H, W]`` luma frames from a ``.y`` file."""
    y_size = width * height
    count = 0
    with open(path, "rb") as f:
        while max_frames is None or count < max_frames:
            buf = f.read(y_size)
            if len(buf) < y_size:
                break
            yield np.frombuffer(buf, dtype=np.uint8).reshape(height, width)
            count += 1


def read_y_frames(path: str, width: int, height: int, max_frames: int | None = None) -> np.ndarray:
    """Read a ``.y`` file into one ``[N, H, W]`` uint8 array (bulk device upload)."""
    y_size = width * height
    file_size = os.path.getsize(path)
    n = file_size // y_size
    if max_frames is not None:
        n = min(n, max_frames)
    with open(path, "rb") as f:
        buf = f.read(n * y_size)
    return np.frombuffer(buf, dtype=np.uint8).reshape(n, height, width)


def read_yuv420_y_frames(path: str, width: int, height: int, max_frames: int | None = None):
    """Yield the Y plane of each YUV420 frame, skipping chroma
    (reference assign1/ex2.py:14-26)."""
    y_size = width * height
    c_size = 2 * (width // 2) * (height // 2)
    count = 0
    with open(path, "rb") as f:
        while max_frames is None or count < max_frames:
            y = f.read(y_size)
            if len(y) < y_size:
                break
            f.seek(c_size, os.SEEK_CUR)
            yield np.frombuffer(y, dtype=np.uint8).reshape(height, width)
            count += 1


def save_y_frames_to_file(params, max_frames: int | None = None) -> str:
    """Extract Y-only frames of ``params.yuv_file`` into ``params.y_only_file``
    (reference assign1/ex2.py:30-46).  Skips work if the output exists."""
    out_path = params.y_only_file
    if os.path.exists(out_path):
        return out_path
    n = max_frames if max_frames is not None else params.frames_to_process
    with open(out_path, "wb") as f_out:
        for frame in read_yuv420_y_frames(params.yuv_file, params.width, params.height, n):
            f_out.write(frame.tobytes())
    return out_path
