"""Device half-pel interpolation: one batched stencil.

Replaces the reference's per-pixel Python loop
(encoder/block_predictor.py:145-177) — the single biggest fixed cost of its
frame loop — with four strided stores computed as whole-frame adds:

* even/even = source sample
* odd-column = ceil of horizontal pair mean
* odd-row    = ceil of vertical pair mean
* odd/odd    = ceil of 4-neighbour mean
* the final interpolated row/column (no neighbour) stays 0.
"""

import jax
import jax.numpy as jnp


@jax.jit
def build_half_pel(frame: jnp.ndarray) -> jnp.ndarray:
    """uint8 [H, W] -> uint8 [2H, 2W] half-pel buffer (ceil semantics)."""
    f = frame.astype(jnp.int32)
    h, w = f.shape
    out = jnp.zeros((2 * h, 2 * w), dtype=jnp.int32)
    out = out.at[0::2, 0::2].set(f)
    out = out.at[0::2, 1 : 2 * w - 1 : 2].set((f[:, :-1] + f[:, 1:] + 1) // 2)
    out = out.at[1 : 2 * h - 1 : 2, 0::2].set((f[:-1, :] + f[1:, :] + 1) // 2)
    out = out.at[1 : 2 * h - 1 : 2, 1 : 2 * w - 1 : 2].set(
        (f[:-1, :-1] + f[:-1, 1:] + f[1:, :-1] + f[1:, 1:] + 3) // 4
    )
    return out.astype(jnp.uint8)


def build_half_pel_batch(frames: jnp.ndarray) -> jnp.ndarray:
    """[N, H, W] -> [N, 2H, 2W] (vmapped stencil)."""
    return jax.vmap(build_half_pel)(frames)
