"""GOP-parallel batch encoding over the ``data`` mesh axis.

GOPs are independent by construction: every I-frame clears the reference
deques (reference encoder.py:174-186), so a video is a sequence of closed
GOPs and a fleet of sequences/GOPs is embarrassingly parallel.  This module
compiles a whole GOP — one intra frame followed by ``T-1`` P-frames, each
feeding its reconstruction to the next — into a single ``lax.scan`` program
and lets ``jit`` + sharding place independent GOPs on different chips; no
collectives are needed inside the step.

Entropy *bit lengths* are produced on device (exact, closed-form); the byte
streams themselves are finalized on host per GOP, which is itself
embarrassingly parallel.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..entropy.zigzag import zigzag_indices
from ..ops import bitlen
from ..ops import transform as T
from ..ops.intra import intra_encode_frame
from ..ops.me import full_search, gather_pred_blocks
from ..ops.interp import build_half_pel


@partial(jax.jit, static_argnames=("bs", "search_range", "qp", "frac"))
def encode_gop(frames: jnp.ndarray, bs: int, search_range: int, qp: int, frac: bool):
    """Encode one GOP: frames[0] intra, frames[1:] inter (single reference =
    previous reconstruction), fixed QP.  Returns
    (recon [T,H,W] u8, qdct [T,H,W] i16, mvs [T-1,nbr,nbc,3], frame_bits [T])."""
    t, h, w = frames.shape
    nbr, nbc = h // bs, w // bs
    d = jnp.asarray(T.dct_matrix(bs))
    Q = jnp.asarray(T.quant_matrices(bs))[qp]
    zz = jnp.asarray(zigzag_indices(bs))

    row_qps = jnp.full(h // bs, qp, jnp.int32)
    tbl = jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.float32)
    recon0, _, _, qdct0, smalls0 = intra_encode_frame(
        frames[0], row_qps, jnp.float32(0), tbl[0], tbl[1].astype(jnp.float32),
        jnp.int32(qp), bs, False,
    )
    row_bits0 = smalls0[-(h // bs):]  # packed tail (see ops/intra.py)

    def p_step(carry, curr):
        ref = carry  # uint8 [H, W]
        refs = ref[None]
        irefs = build_half_pel(ref)[None] if frac else jnp.zeros((1, 2 * h, 2 * w), jnp.uint8)
        mvs, sads, preds = full_search(curr, refs, irefs, bs, search_range, frac)
        cblocks = curr.astype(jnp.int32).reshape(nbr, bs, nbc, bs).transpose(0, 2, 1, 3)
        q = T.quantize(T.dct2((cblocks - preds).astype(jnp.float32), d), Q)
        qi = q.astype(jnp.int32)
        bits = bitlen.rle_block_bits(qi.reshape(nbr * nbc, bs * bs)[:, zz]).sum()
        recon_blocks, _ = T.reconstruct(q, Q, preds, d)
        recon = recon_blocks.transpose(0, 2, 1, 3).reshape(h, w).astype(jnp.uint8)
        qdct = qi.astype(jnp.int16).transpose(0, 2, 1, 3).reshape(h, w)
        return recon, (recon, qdct, mvs, bits)

    _, (recons, qdcts, mvs, pbits) = jax.lax.scan(p_step, recon0.astype(jnp.uint8), frames[1:])
    recon_all = jnp.concatenate([recon0[None], recons])
    qdct_all = jnp.concatenate([qdct0[None], qdcts])
    bits_all = jnp.concatenate([row_bits0.sum()[None], pbits])
    return recon_all, qdct_all, mvs, bits_all


def encode_gops_sharded(mesh, gops, bs: int, search_range: int, qp: int, frac: bool = False):
    """Batch of GOPs ``[B, T, H, W]`` sharded over the ``data`` axis; each
    device encodes its GOPs independently (vmap of :func:`encode_gop`)."""
    sharding = NamedSharding(mesh, P("data", None, None, None))
    gops = jax.device_put(gops, sharding)
    fn = jax.vmap(partial(encode_gop, bs=bs, search_range=search_range, qp=qp, frac=frac))
    return jax.jit(fn)(gops)
