"""Pallas TPU kernel: full-search SAD motion estimation + MC prediction.

One kernel program scores every candidate displacement for every block of the
frame from VMEM-resident data (replacing reference block_predictor.py:61-91):

* the current frame and the zero-padded reference planes are staged into
  VMEM once; each candidate is a *static* slice of the padded plane, so the
  ``(2r+1)^2 x n_ref`` candidate loop unrolls into pure on-chip work with no
  HBM traffic,
* per-block SAD box reductions run on the **MXU** as two matmuls with 0/1
  block-selector matrices (``A @ |diff| @ B``) — Mosaic has no 4-D vector
  reshape, and the matmul form is faster anyway (values < 2^24, exact in
  float32),
* the winner per block is the running strict-minimum of
  ``SAD * 256 + |mvx| + |mvy|`` in the reference's enumeration order
  (ref-major, dy, dx) — identical tie-break semantics to ops/me.py,
* a second unrolled pass select-accumulates the winning candidate's pixels
  into the prediction plane, expanding the per-block winner mask with the
  transposed selector matmuls,
* fractional ME reads the 2x half-pel plane with static stride-2 slices.

Out-of-range candidates are masked per block with iota-derived validity; the
pad value never reaches a selected result.

Fallback: ops/me.full_search (pure XLA) — used on non-TPU backends and for
candidate counts above the unroll budget.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 2 ** 30  # plain int: jnp scalars would be captured as kernel constants
MAX_UNROLL_CANDIDATES = 512  # compile-time budget for the static loop
_F32 = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=None)
def _selectors(h: int, w: int, bs: int):
    """A [nbr, H] and B [W, nbc] 0/1 selector matrices for block box sums."""
    nbr, nbc = h // bs, w // bs
    a = np.zeros((nbr, h), np.float32)
    a[np.arange(h) // bs, np.arange(h)] = 1.0
    b = np.zeros((w, nbc), np.float32)
    b[np.arange(w), np.arange(w) // bs] = 1.0
    return a, b


def _me_kernel(curr_ref, pad_ref, a_ref, b_ref, dx_out, dy_out, k_out, sad_out,
               pred_out, *, bs, r, n_ref, frac, h, w):
    """curr: [H, W] i32; pad: [n_ref, Hp, Wp] i32 (padded by r each side);
    a: [nbr, H] f32; b: [W, nbc] f32.
    Outputs: dx/dy/ref/sad [nbr, nbc] i32, pred [H, W] i32."""
    nbr, nbc = h // bs, w // bs
    scale = 2 if frac else 1

    curr = curr_ref[:].astype(jnp.float32)
    a = a_ref[:]
    b = b_ref[:]
    bx = jax.lax.broadcasted_iota(jnp.int32, (nbr, nbc), 1) * bs * scale
    by = jax.lax.broadcasted_iota(jnp.int32, (nbr, nbc), 0) * bs * scale
    lim_w, lim_h, bspan = w * scale, h * scale, bs * scale

    def aligned(k, dy, dx):
        if frac:
            return jax.lax.slice(
                pad_ref[k], (r + dy, r + dx),
                (r + dy + 2 * h, r + dx + 2 * w), (2, 2),
            )
        return jax.lax.slice(pad_ref[k], (r + dy, r + dx), (r + dy + h, r + dx + w))

    def block_sums(diff_f32):
        rows = jnp.dot(a, diff_f32, preferred_element_type=jnp.float32, precision=_F32)
        return jnp.dot(rows, b, preferred_element_type=jnp.float32, precision=_F32)

    best_key = jnp.full((nbr, nbc), BIG, dtype=jnp.int32)
    best_idx = jnp.zeros((nbr, nbc), dtype=jnp.int32)
    idx = 0
    for k in range(n_ref):
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                cand = aligned(k, dy, dx).astype(jnp.float32)
                sad = block_sums(jnp.abs(curr - cand)).astype(jnp.int32)
                valid = (
                    (bx + dx >= 0) & (bx + dx + bspan <= lim_w)
                    & (by + dy >= 0) & (by + dy + bspan <= lim_h)
                )
                key = jnp.where(valid, sad * 256 + (abs(dx) + abs(dy)), BIG)
                take = key < best_key  # strict: first minimum wins
                best_key = jnp.where(take, key, best_key)
                best_idx = jnp.where(take, idx, best_idx)
                idx += 1

    sad_out[:] = best_key >> 8  # l1 < 256, so key>>8 recovers the SAD
    span = 2 * r + 1
    per_ref = span * span
    rem = best_idx % per_ref
    dx_out[:] = rem % span - r
    dy_out[:] = rem // span - r
    k_out[:] = best_idx // per_ref

    # second pass: expand each candidate's winner mask to pixels via the
    # transposed selectors and select its pixels into the prediction plane
    pred = jnp.zeros((h, w), dtype=jnp.int32)
    idx = 0
    for k in range(n_ref):
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                m = (best_idx == idx).astype(jnp.float32)
                rows = jnp.dot(a.T, m, preferred_element_type=jnp.float32, precision=_F32)
                mask_px = jnp.dot(rows, b.T, preferred_element_type=jnp.float32, precision=_F32)
                pred = jnp.where(mask_px > 0.5, aligned(k, dy, dx), pred)
                idx += 1
    pred_out[:] = pred


@partial(jax.jit, static_argnames=("bs", "search_range", "frac", "interpret"))
def full_search_pallas(curr: jnp.ndarray, refs: jnp.ndarray, interp_refs: jnp.ndarray,
                       bs: int, search_range: int, frac: bool, interpret: bool = False):
    """Drop-in replacement for ops.me.full_search (same outputs)."""
    h, w = curr.shape
    nbr, nbc = h // bs, w // bs
    n_ref = refs.shape[0]
    sr = search_range * 2 if frac else search_range

    planes = interp_refs if frac else refs
    pad = jnp.pad(planes.astype(jnp.int32), ((0, 0), (sr, sr), (sr, sr)))
    curr_i = curr.astype(jnp.int32)
    a_np, b_np = _selectors(h, w, bs)

    kernel = partial(_me_kernel, bs=bs, r=sr, n_ref=n_ref, frac=frac, h=h, w=w)
    spec = pl.BlockSpec(memory_space=pl.ANY if interpret else pltpu.VMEM)
    dx, dy, k_sel, sad, pred = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nbr, nbc), jnp.int32),
            jax.ShapeDtypeStruct((nbr, nbc), jnp.int32),
            jax.ShapeDtypeStruct((nbr, nbc), jnp.int32),
            jax.ShapeDtypeStruct((nbr, nbc), jnp.int32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        in_specs=[spec] * 4,
        out_specs=(spec,) * 5,
        interpret=interpret,
    )(curr_i, pad, jnp.asarray(a_np), jnp.asarray(b_np))
    mvs = jnp.stack([dx, dy, k_sel], axis=-1)
    preds = pred.reshape(nbr, bs, nbc, bs).transpose(0, 2, 1, 3)
    return mvs, sad, preds


def pallas_supported(n_ref: int, search_range: int, frac: bool) -> bool:
    sr = search_range * 2 if frac else search_range
    return n_ref * (2 * sr + 1) ** 2 <= MAX_UNROLL_CANDIDATES


# Measured selection gate (real v5e, CIF, see PROFILE.md §4): the Pallas
# kernel beats the XLA scan for small candidate windows (25 candidates:
# 1.15 ms vs 1.49 ms) but the unrolled-candidate stack blows the 16 MB
# scoped-VMEM budget for large ones (81 candidates at CIF: 20.4 MB -> OOM).
PALLAS_MAX_CANDIDATES = 32
PALLAS_VMEM_BUDGET = 12 << 20  # conservative margin under the 16 MB limit


def use_pallas(h: int, w: int, bs: int, search_range: int, n_ref: int,
               frac: bool) -> bool:
    """True when the Pallas path is both compilable (VMEM) and measured
    faster than ops.me.full_search for this shape class, on a TPU backend."""
    import jax

    if jax.default_backend() != "tpu":
        return False
    sr = search_range * 2 if frac else search_range
    n_cand = n_ref * (2 * sr + 1) ** 2
    scale = 2 if frac else 1
    vmem = 4 * (n_ref * (h * scale + 2 * sr) * (w * scale + 2 * sr) + 8 * h * w)
    return n_cand <= PALLAS_MAX_CANDIDATES and vmem <= PALLAS_VMEM_BUDGET
