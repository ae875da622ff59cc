"""Block-average "codec" quality study (reference assign1/ex2.py:49-199).

Replaces each block with its rounded mean at several block sizes, writes the
``<bs>b.y`` planes next to the source, and reports PSNR/SSIM vs block size.
The per-block Python loops of the reference are replaced by whole-frame
reshape/mean operations.
"""

import os

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt
from scipy.ndimage import uniform_filter

from ..io.fileio import FileIOHelper
from ..io.yuv import save_y_frames_to_file
from ..utils.frame_utils import pad_frame, psnr
from ..utils.logger import get_logger

logger = get_logger()


def block_average_frame(frame: np.ndarray, bs: int) -> np.ndarray:
    """Every block replaced by round(mean(block)) (reference ex2.py:49-54),
    computed as one reshape-mean-broadcast."""
    padded = pad_frame(frame, bs)
    h, w = padded.shape
    blocks = padded.reshape(h // bs, bs, w // bs, bs).astype(np.float64)
    means = np.round(blocks.mean(axis=(1, 3))).astype(np.uint8)
    return np.broadcast_to(means[:, None, :, None], (h // bs, bs, w // bs, bs)).reshape(h, w)


def ssim(a: np.ndarray, b: np.ndarray, win: int = 7, data_range: float = 255.0) -> float:
    """Structural similarity, uniform 7x7 window with sample covariance —
    the defaults the reference gets from skimage (ex2.py:139)."""
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    n = win * win
    cov_norm = n / (n - 1)
    ua = uniform_filter(a, win)
    ub = uniform_filter(b, win)
    uaa = uniform_filter(a * a, win)
    ubb = uniform_filter(b * b, win)
    uab = uniform_filter(a * b, win)
    va = cov_norm * (uaa - ua * ua)
    vb = cov_norm * (ubb - ub * ub)
    vab = cov_norm * (uab - ua * ub)
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    s = ((2 * ua * ub + c1) * (2 * vab + c2)) / ((ua ** 2 + ub ** 2 + c1) * (va + vb + c2))
    pad = win // 2
    return float(s[pad:-pad, pad:-pad].mean())


def process_y_frames(params, block_sizes):
    """Write ``<bs>b.y`` block-averaged planes (reference ex2.py:67-121);
    skips sizes whose outputs already exist."""
    file_io = FileIOHelper(params)
    y_size = params.width * params.height
    outputs = {}
    for bs in block_sizes:
        name = file_io.get_file_name_wo_identifier(f"{bs}b.y")
        if not os.path.exists(name):
            outputs[bs] = open(name, "wb")
    if not outputs:
        return
    with open(params.y_only_file, "rb") as f_in:
        while True:
            buf = f_in.read(y_size)
            if len(buf) < y_size:
                break
            frame = np.frombuffer(buf, dtype=np.uint8).reshape(params.height, params.width)
            for bs, fh in outputs.items():
                fh.write(block_average_frame(frame, bs)[: params.height, : params.width].tobytes())
    for fh in outputs.values():
        fh.close()


def calculate_psnr_ssim(original_file, averaged_file, width, height):
    """Per-frame and mean PSNR/SSIM between two .y files (ex2.py:124-152)."""
    psnrs, ssims = [], []
    size = width * height
    with open(original_file, "rb") as fo, open(averaged_file, "rb") as fa:
        while True:
            a = fo.read(size)
            b = fa.read(size)
            if len(a) < size or len(b) < size:
                break
            fa_ = np.frombuffer(a, np.uint8).reshape(height, width)
            fb_ = np.frombuffer(b, np.uint8).reshape(height, width)
            psnrs.append(psnr(fa_, fb_))
            ssims.append(ssim(fa_, fb_))
    return float(np.mean(psnrs)), float(np.mean(ssims))


def run_study(params, block_sizes=(1, 2, 8, 16, 64), out_png=None):
    """Full study: extract Y, block-average at each size, plot PSNR/SSIM vs
    block size (reference ex2.py main, :155-199)."""
    if params.yuv_file:
        save_y_frames_to_file(params)
    process_y_frames(params, block_sizes)
    file_io = FileIOHelper(params)
    results = []
    for bs in block_sizes:
        avg_file = file_io.get_file_name_wo_identifier(f"{bs}b.y")
        p, s = calculate_psnr_ssim(params.y_only_file, avg_file, params.width, params.height)
        results.append((bs, p, s))
        logger.info(f"block {bs}: PSNR={p:.2f} SSIM={s:.4f}")

    if out_png:
        bss, ps, ss = zip(*results)
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 6))
        ax1.plot(bss, ps, marker="o", label="PSNR")
        ax1.set_title("PSNR vs Block Size")
        ax1.set_xlabel("Block Size")
        ax1.set_ylabel("PSNR (dB)")
        ax1.grid(True)
        ax1.legend()
        ax2.plot(bss, ss, marker="o", color="orange", label="SSIM")
        ax2.set_title("SSIM vs Block Size")
        ax2.set_xlabel("Block Size")
        ax2.set_ylabel("SSIM")
        ax2.grid(True)
        ax2.legend()
        fig.tight_layout()
        fig.savefig(out_png)
        plt.close(fig)
    return results
