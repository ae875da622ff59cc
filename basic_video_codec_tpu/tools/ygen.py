"""Synthetic Y-only test video generator.

The reference keeps its real sequences in (unhydrated) git-LFS, so its tests
synthesize video (tests/y_generator.py): textured frames with deterministic
translation so motion-estimation answers are known a priori.  This module
provides the same capability for this framework's conformance and benchmark
fixtures:

* ``textured_frame``   — smooth gradient + shapes, enough high-frequency
  content that DCT/quant/entropy paths see realistic coefficient spread,
* ``marked_frame``     — flat frame with a small bright marker (MV recovery
  tests place it, roll it, and assert the recovered vector),
* ``moving_sequence``  — frames translated by a deterministic shift pattern
  cycling horizontal / vertical / diagonal motion,
* ``noise_sequence``   — seeded uniform noise (worst case for entropy coding),
* ``write_y_file``     — dump a sequence as a raw ``.y`` file.
"""

import numpy as np


def textured_frame(width: int, height: int, seed: int = 0) -> np.ndarray:
    """Deterministic textured frame: diagonal gradient, disc, triangle, ripple."""
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float64)
    base = (xx * 0.7 + yy * 0.5) % 256.0

    cx, cy, r = width * 0.35, height * 0.4, min(width, height) * 0.22
    disc = ((xx - cx) ** 2 + (yy - cy) ** 2) <= r * r
    base[disc] = (base[disc] + 96.0) % 256.0

    tri = (xx + yy * 0.8 > width * 0.9) & (xx - yy * 1.2 < width * 0.6)
    base[tri] = 255.0 - base[tri]

    ripple = 14.0 * np.sin(xx / 6.3 + seed) * np.cos(yy / 4.7 - seed * 0.5)
    return np.clip(base + ripple, 0, 255).astype(np.uint8)


def marked_frame(width: int, height: int, marker_pos=(0, 0), marker_size: int = 4,
                 background: int = 60, marker_value: int = 220) -> np.ndarray:
    frame = np.full((height, width), background, dtype=np.uint8)
    x, y = marker_pos
    frame[y : y + marker_size, x : x + marker_size] = marker_value
    return frame


_SHIFTS = [0, 2, 4, 8, 16, 32]


def moving_sequence(width: int, height: int, n_frames: int, seed: int = 0) -> np.ndarray:
    """``[N, H, W]`` uint8: a textured frame translated by a deterministic
    pattern — shift magnitude cycles ``_SHIFTS``, direction cycles
    horizontal / vertical / diagonal (mirrors the reference fixture's idea,
    tests/y_generator.py:95-172)."""
    base = textured_frame(width, height, seed)
    frames = [base]
    dx = dy = 0
    for i in range(1, n_frames):
        mag = _SHIFTS[i % len(_SHIFTS)]
        direction = i % 3
        if direction == 0:
            dx += mag
        elif direction == 1:
            dy += mag
        else:
            dx += mag
            dy += mag
        frames.append(np.roll(np.roll(base, dy, axis=0), dx, axis=1))
    return np.stack(frames)


def noise_sequence(width: int, height: int, n_frames: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n_frames, height, width), dtype=np.uint8)


def _box_blur(img: np.ndarray, k: int) -> np.ndarray:
    """Separable (2k+1)-tap box blur, edge-clamped — a cheap gaussian."""

    def blur_rows(a):
        pad = np.pad(a, ((k, k), (0, 0)), mode="edge")
        c = np.cumsum(pad, axis=0)
        c = np.vstack([np.zeros((1, a.shape[1])), c])
        return (c[2 * k + 1 :] - c[: a.shape[0]]) / (2 * k + 1)

    return blur_rows(blur_rows(img).T).T


def _natural_plate(width: int, height: int, rng, margin: int = 64) -> np.ndarray:
    """An oversized 'scene plate' with camera-like spatial statistics:
    multi-octave blurred noise (≈1/f spectrum) + a smooth illumination
    gradient + a few hard-edged objects.  Sampled with a moving window to
    simulate panning, so it is larger than the output frame by ``margin``."""
    H, W = height + 2 * margin, width + 2 * margin
    img = np.zeros((H, W), np.float64)
    # 1/f-ish detail: octaves of blurred white noise.  A (2k+1)-box blur
    # attenuates white noise std by 1/(2k+1), so amplitudes scale with k to
    # land each octave's contribution at ~5-8 gray levels (rising with
    # scale, like natural image spectra).
    for k, amp in ((1, 15.0), (3, 42.0), (7, 105.0), (15, 248.0)):
        img += amp * _box_blur(rng.standard_normal((H, W)), k)
    # smooth illumination gradient (sky->ground)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float64)
    img += 90.0 + 50.0 * (yy / H) + 20.0 * np.sin(xx / W * 3.1)
    # hard-edged objects (buildings/signs): rectangles and a disc
    for _ in range(6):
        x0 = int(rng.integers(0, W - 40)); y0 = int(rng.integers(0, H - 40))
        w0 = int(rng.integers(20, 120)); h0 = int(rng.integers(20, 120))
        img[y0 : y0 + h0, x0 : x0 + w0] += float(rng.uniform(-60, 60))
    cx, cy = rng.uniform(0.2, 0.8) * W, rng.uniform(0.2, 0.8) * H
    r = 0.12 * min(W, H)
    disc = ((xx - cx) ** 2 + (yy - cy) ** 2) <= r * r
    img[disc] += 45.0
    return img


def _sample_window(plate: np.ndarray, ox: float, oy: float, zoom: float,
                   width: int, height: int) -> np.ndarray:
    """Bilinear sample of a (possibly zoomed) window at float offset."""
    ys = oy + np.arange(height) / zoom
    xs = ox + np.arange(width) / zoom
    y0 = np.clip(ys.astype(np.int64), 0, plate.shape[0] - 2)
    x0 = np.clip(xs.astype(np.int64), 0, plate.shape[1] - 2)
    fy = (ys - y0)[:, None]
    fx = (xs - x0)[None, :]
    a = plate[y0][:, x0]
    b = plate[y0][:, x0 + 1]
    c = plate[y0 + 1][:, x0]
    d = plate[y0 + 1][:, x0 + 1]
    return (a * (1 - fy) * (1 - fx) + b * (1 - fy) * fx
            + c * fy * (1 - fx) + d * fy * fx)


def camera_sequence(width: int, height: int, n_frames: int, seed: int = 0,
                    cut_at: int | None = None, grain: float = 2.5) -> np.ndarray:
    """``[N, H, W]`` uint8 with real-camera statistics — the stand-in for the
    reference's unhydrated LFS sequences (foreman/e3 CIF,
    reference results/rd_experiment_results.csv):

    * multi-octave ≈1/f spatial detail with smooth gradients and hard edges
      (``_natural_plate``),
    * a natural pan with slow acceleration plus a gentle zoom, sampled at
      SUBPIXEL offsets (bilinear) — motion is not grid-aligned, exercising
      fractional ME and fastME drift chains,
    * luma-dependent sensor grain (shot noise ~ sqrt(luma)),
    * an optional hard scene cut at ``cut_at`` onto a second plate panning
      the opposite way (RC scene-change detection).
    """
    rng = np.random.default_rng(seed)
    margin = 64
    plate = _natural_plate(width, height, rng, margin)
    plate2 = _natural_plate(width, height, rng, margin) if cut_at else None
    frames = []
    # pan velocity in px/frame with mild acceleration; stays inside margin
    vx, vy = rng.uniform(0.6, 1.8), rng.uniform(-0.5, 0.5)
    ax, ay = rng.uniform(-0.05, 0.05), rng.uniform(-0.03, 0.03)
    ox, oy = float(margin), float(margin)
    zoom = 1.0
    dz = rng.uniform(0.0005, 0.002)
    for i in range(n_frames):
        if cut_at and i == cut_at:
            plate, plate2 = plate2, None
            ox, oy = float(margin), float(margin)
            vx, vy = -vx, -vy  # opposite pan after the cut
            zoom, dz = 1.0, -dz
        img = _sample_window(plate, ox, oy, zoom, width, height)
        base = np.clip(img, 0, 255)
        noise = rng.standard_normal((height, width))
        img = base + noise * (grain * np.sqrt(base / 255.0 + 0.05))
        frames.append(np.clip(img, 0, 255).astype(np.uint8))
        vx += ax
        vy += ay
        lim_x = plate.shape[1] - width / min(zoom, 1.0) - 2
        lim_y = plate.shape[0] - height / min(zoom, 1.0) - 2
        ox = float(np.clip(ox + vx, 0, lim_x))
        oy = float(np.clip(oy + vy, 0, lim_y))
        zoom = max(0.9, zoom + dz)
    return np.stack(frames)


def write_y_file(path: str, frames: np.ndarray) -> str:
    with open(path, "wb") as f:
        f.write(np.ascontiguousarray(frames, dtype=np.uint8).tobytes())
    return path
