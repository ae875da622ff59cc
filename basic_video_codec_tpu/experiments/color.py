"""YUV color tools and the noise-mask visualization study
(reference assign1/ex1.py:17-183 capabilities).

* read YUV420 planar frames,
* upsample chroma 4:2:0 -> 4:4:4 (bilinear),
* BT.601 YUV -> RGB conversion,
* a grid figure visualizing noise applied to individual Y/U/V planes.
"""

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt
from scipy.ndimage import zoom


def read_yuv420(file, width, height):
    y_size = width * height
    uv_size = (width // 2) * (height // 2)
    y = np.frombuffer(file.read(y_size), dtype=np.uint8).reshape(height, width)
    u = np.frombuffer(file.read(uv_size), dtype=np.uint8).reshape(height // 2, width // 2)
    v = np.frombuffer(file.read(uv_size), dtype=np.uint8).reshape(height // 2, width // 2)
    return y, u, v


def upscale_chroma(u_plane, v_plane):
    """4:2:0 -> 4:4:4 by bilinear zoom (reference ex1.py:10-13)."""
    return zoom(u_plane, 2, order=1), zoom(v_plane, 2, order=1)


def yuv_to_rgb(y_plane, u_plane, v_plane):
    """BT.601 limited-range YUV444 -> RGB (reference ex1.py:32-58)."""
    m = np.array([[1.164, 0.0, 1.596],
                  [1.164, -0.392, -0.813],
                  [1.164, 2.017, 0.0]])
    yuv = np.stack(
        [y_plane.astype(np.float32) - 16,
         u_plane.astype(np.float32) - 128,
         v_plane.astype(np.float32) - 128], axis=-1)
    return np.clip(yuv @ m.T, 0, 255).astype(np.uint8)


def noise_mask_grid(yuv_path, width, height, out_path, noise_scale=48, seed=0):
    """Visualize per-plane noise sensitivity: a grid of the original frame and
    the frame with noise injected into Y-only, U-only, V-only and all planes
    (the study reference ex1.py builds)."""
    rng = np.random.default_rng(seed)
    with open(yuv_path, "rb") as f:
        y, u, v = read_yuv420(f, width, height)
    u444, v444 = upscale_chroma(u, v)

    def noisy(plane):
        n = rng.integers(-noise_scale, noise_scale + 1, plane.shape)
        return np.clip(plane.astype(np.int32) + n, 0, 255).astype(np.uint8)

    variants = [
        ("original", y, u444, v444),
        ("noisy Y", noisy(y), u444, v444),
        ("noisy U", y, noisy(u444), v444),
        ("noisy V", y, u444, noisy(v444)),
        ("noisy YUV", noisy(y), noisy(u444), noisy(v444)),
    ]
    fig, axes = plt.subplots(1, len(variants), figsize=(4 * len(variants), 4))
    for ax, (name, yy, uu, vv) in zip(axes, variants):
        ax.imshow(yuv_to_rgb(yy, uu, vv))
        ax.set_title(name)
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
