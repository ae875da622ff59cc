"""Chunked (multi-frame) encode programs.

One jitted program encodes a whole GOP — the intra frame plus a ``lax.scan``
over its P-frames, the reconstruction chain carried on device — so the host
dispatches (and later fetches) once per GOP instead of once per frame.  On
remote-attached TPUs every dispatched program on the inter-frame dependency
chain costs round-trip latency; chunking divides that cost by the GOP length.

Eligibility: single reference frame (RC modes 0/1 here; RC 2/3 use the
fused two-pass chunk in models/two_pass.py).  nRefFrames > 1 needs a rolling
reference stack across scan steps and runs the per-frame path
(models/pipeline.py).
"""

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.intra import intra_decode_frame, intra_encode_frame
from .pframe import pframe_decode, pframe_encode


@partial(jax.jit, static_argnames=("bs", "rc1", "exact"))
def encode_chunk_intra_only(
    frames: jnp.ndarray,        # uint8 [K, H, W]
    row_qps: jnp.ndarray,       # int32 [nbr]
    budget0: jnp.ndarray,
    tbl_qps: jnp.ndarray,
    tbl_bits: jnp.ndarray,
    initial_qp: jnp.ndarray,
    bs: int,
    rc1: bool,
    exact: bool = False,
):
    """All-intra chunk (I_Period == 1): every frame clears the reference
    deques, so frames are fully independent — one ``vmap`` instead of a scan.
    Returns stacked ``(recons, arts, qdcts, smalls)``."""
    def one(frame):
        recon, _, art, qdct, smalls = intra_encode_frame(
            frame, row_qps, budget0, tbl_qps, tbl_bits, initial_qp, bs, rc1,
            emit_halfpel=False, exact=exact,
        )
        return recon, art, qdct, smalls

    return jax.vmap(one)(frames)


@partial(jax.jit, static_argnames=("bs", "search_range", "rc1", "fast", "frac",
                                   "first_is_intra", "exact"))
def encode_chunk(
    frames: jnp.ndarray,        # uint8 [K, H, W]
    ref0: jnp.ndarray,          # uint8 [H, W] incoming reference (used iff not first_is_intra)
    hp0: jnp.ndarray,           # uint8 [2H, 2W] its half-pel plane (used iff frac)
    row_qps: jnp.ndarray,       # int32 [nbr]
    budget0: jnp.ndarray,       # float32 scalar (RC1)
    tbl_qps: jnp.ndarray,
    tbl_bits: jnp.ndarray,
    initial_qp: jnp.ndarray,
    bs: int,
    search_range: int,
    rc1: bool,
    fast: bool,
    frac: bool,
    first_is_intra: bool,
    exact: bool = False,
):
    """Returns ``(intra_out | None, p_out, ref_out, hp_out)`` where
    ``intra_out = (recon, art, qdct, smalls)`` for frames[0] and
    ``p_out = (recons, arts, qdcts, smalls)`` stacked over the chunk's
    P-frames; ``ref_out``/``hp_out`` carry the reference into the next chunk.
    """
    h, w = frames.shape[1:]

    if first_is_intra:
        recon_i, hp_i, art_i, qdct_i, smalls_i = intra_encode_frame(
            frames[0], row_qps, budget0, tbl_qps, tbl_bits, initial_qp,
            bs, rc1, emit_halfpel=frac, exact=exact,
        )
        intra_out = (recon_i, art_i, qdct_i, smalls_i)
        carry = (recon_i, hp_i if frac else jnp.zeros((2 * h, 2 * w), jnp.uint8))
        p_frames = frames[1:]
    else:
        intra_out = None
        carry = (ref0, hp0 if frac else jnp.zeros((2 * h, 2 * w), jnp.uint8))
        p_frames = frames

    def step(carry, curr):
        ref, hp = carry
        recon, hp2, art, qdct, smalls = pframe_encode(
            curr, (ref,), (hp,) if frac else (), row_qps, budget0,
            tbl_qps, tbl_bits, initial_qp, bs, search_range, rc1, fast, frac,
            False, emit_halfpel=frac, exact=exact,
        )
        if not frac:
            hp2 = hp
        return (recon, hp2), (recon, art, qdct, smalls)

    if p_frames.shape[0] > 0:
        (ref_out, hp_out), p_out = jax.lax.scan(step, carry, p_frames)
    else:
        ref_out, hp_out = carry
        nbr, nbc = h // bs, w // bs
        nb = nbr * nbc
        p_out = (
            jnp.zeros((0, h, w), jnp.uint8),
            jnp.zeros((0, h, w), jnp.uint8),
            jnp.zeros((0, h, w), jnp.int16),
            jnp.zeros((0, 5 * nb + 2 * nbr), jnp.int32),
        )
    return intra_out, p_out, ref_out, hp_out


@partial(jax.jit, static_argnames=("bs", "frac", "exact"))
def decode_chunk_intra_only(
    qdcts: jnp.ndarray,     # int32 [K, H, W]
    modes: jnp.ndarray,     # int32 [K, nbr, nbc]
    row_qps: jnp.ndarray,   # int32 [K, nbr]
    bs: int,
    frac: bool,
    exact: bool = False,
):
    """All-intra decode chunk: frames are independent -> vmap.
    Returns ``(decoded [K, H, W], ref_out, hp_out)``."""
    decoded = jax.vmap(
        lambda q, m, r: intra_decode_frame(q, m, r, bs, emit_halfpel=False,
                                           exact=exact)[0]
    )(qdcts, modes, row_qps)
    ref_out = decoded[-1]
    if frac:
        from ..ops.interp import build_half_pel

        hp_out = build_half_pel(ref_out)
    else:
        h, w = qdcts.shape[1:]
        hp_out = jnp.zeros((2 * h, 2 * w), jnp.uint8)
    return decoded, ref_out, hp_out


@partial(jax.jit, static_argnames=("bs", "frac", "first_is_intra", "exact"))
def decode_chunk(
    qdcts: jnp.ndarray,     # int32 [K, H, W]
    mvs: jnp.ndarray,       # int32 [K, nbr, nbc, 3] (row 0 ignored if intra)
    row_qps: jnp.ndarray,   # int32 [K, nbr]
    modes0: jnp.ndarray,    # int32 [nbr, nbc] (frame 0's intra modes)
    ref0: jnp.ndarray,      # uint8 [H, W] incoming reference
    hp0: jnp.ndarray,       # uint8 [2H, 2W]
    bs: int,
    frac: bool,
    first_is_intra: bool,
    exact: bool = False,
):
    """Decode one GOP segment in a single program (the decode mirror of
    :func:`encode_chunk`).  Returns ``(decoded [K, H, W], ref_out, hp_out)``."""
    k, h, w = qdcts.shape

    if first_is_intra:
        dec0, hp_i = intra_decode_frame(qdcts[0], modes0, row_qps[0], bs,
                                        emit_halfpel=frac, exact=exact)
        carry = (dec0, hp_i if frac else hp0)
        p_qdcts, p_mvs, p_qps = qdcts[1:], mvs[1:], row_qps[1:]
    else:
        carry = (ref0, hp0)
        p_qdcts, p_mvs, p_qps = qdcts, mvs, row_qps

    def step(carry, inp):
        ref, hp = carry
        qdct, mv, qps = inp
        dec, hp2 = pframe_decode(qdct, mv, qps, (ref,), (hp,) if frac else (),
                                 bs, frac, emit_halfpel=frac, exact=exact)
        if not frac:
            hp2 = hp
        return (dec, hp2), dec

    if p_qdcts.shape[0] > 0:
        (ref_out, hp_out), decs = jax.lax.scan(step, carry, (p_qdcts, p_mvs, p_qps))
    else:
        ref_out, hp_out = carry
        decs = jnp.zeros((0, h, w), jnp.uint8)
    if first_is_intra:
        decoded = jnp.concatenate([dec0[None], decs])
    else:
        decoded = decs
    return decoded, ref_out, hp_out
