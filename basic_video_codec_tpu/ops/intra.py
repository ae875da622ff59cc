"""Device I-frame encoder: a compiled scan over block rows x blocks.

Intra prediction has a hard dependency chain — block (r, c) predicts from the
*reconstructed* left column of (r, c-1) and top row of (r-1, c)
(reference IFrame.py:198-213) — so exact reproduction cannot batch blocks of a
frame freely.  The TPU design keeps the chain but compiles it: one
``lax.scan`` over rows whose step runs a ``lax.scan`` over the row's blocks,
each step doing predictor selection + DCT/quant/reconstruct as fused device
ops.  A CIF frame is 396 tiny steps inside a single XLA program instead of
396 Python loop iterations with scipy calls.

Rate control rides the row scan: the row QP is chosen *inside* the scan from
the remaining bit budget (RCflag 1, reference Frame.py:168-188 /
RateControl.py:34-43), with the exact row cost computed on device via
closed-form entropy lengths (ops/bitlen.py) — or supplied as a per-row input
array (fixed QP, and RC 2/3 passes where QPs are known up front).

Quirks preserved: transposed predictors, uint8-wraparound mode decision at
non-border blocks (implemented as ``(curr - pred) & 255``), int-promoted
decision at borders, and the always-'I' lookup row.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from . import bitlen
from . import transform as T


def _select_qp_rc1(budget, rows_left, tbl_qps, tbl_bits):
    """First table QP whose expected row bits fit the constant row budget,
    else the max table QP (reference RateControl.py:34-43; table iterated in
    ascending QP order)."""
    row_budget = budget / rows_left.astype(jnp.float32)
    fits = tbl_bits <= row_budget
    first_fit = jnp.argmax(fits)  # first True (argmax returns first maximal)
    return jnp.where(fits.any(), tbl_qps[first_fit], tbl_qps[-1])


@partial(jax.jit, static_argnames=("bs", "rc1", "emit_halfpel", "exact"))
def intra_encode_frame(
    curr: jnp.ndarray,            # uint8 [H, W]
    row_qps_in: jnp.ndarray,      # int32 [nbr] (used when rc1=False)
    budget0: jnp.ndarray,         # float32 scalar (used when rc1=True)
    tbl_qps: jnp.ndarray,         # int32 [n_tbl] ascending
    tbl_bits: jnp.ndarray,        # float32 [n_tbl] expected 'I' bits/row
    initial_qp: jnp.ndarray,      # int32 scalar (qp_diff base, Frame.py:42-43)
    bs: int,
    rc1: bool,
    emit_halfpel: bool = False,
    exact: bool = False,
):
    """Returns ``(recon_u8 [H, W], halfpel_u8 [2H, 2W] | None,
    art_u8 [H, W] residual-wrap plane, qdct_i16 [H, W], smalls_i32 [...])``
    — smalls pack (modes, mae_sums, row_qps, row_bits); see unpack in
    pipeline.  recon is a standalone output so the next frame's program can
    consume it without an eager host-side slice (every eager op between
    frames adds a dispatched program to the dependency chain)."""
    h, w = curr.shape
    nbr, nbc = h // bs, w // bs
    d = jnp.asarray(T.dct_matrix(bs))
    qmats = jnp.asarray(T.quant_matrices(bs))  # [nqp, bs, bs]
    curr_i = curr.astype(jnp.int32)

    def block_step(carry, j):
        recon, y, qp = carry
        x = j * bs
        cblk = jax.lax.dynamic_slice(curr_i, (y, x), (bs, bs))

        # --- predictor candidates (transposed quirk) ---
        left_col = jax.lax.dynamic_slice(recon, (y, jnp.maximum(x - 1, 0)), (bs, 1))
        pred_h_in = jnp.broadcast_to(left_col[:, 0][None, :], (bs, bs))  # H[a,b]=left[b]
        top_row = jax.lax.dynamic_slice(recon, (jnp.maximum(y - 1, 0), x), (1, bs))
        pred_v_in = jnp.broadcast_to(top_row[0][:, None], (bs, bs))      # V[a,b]=top[a]
        border = jnp.full((bs, bs), 128, dtype=jnp.int32)
        pred_h = jnp.where(x > 0, pred_h_in, border)
        pred_v = jnp.where(y > 0, pred_v_in, border)

        # --- mode decision: uint8 wraparound at interior, plain abs at border ---
        sad_h_wrap = ((cblk - pred_h) & 255).sum()
        sad_h_border = jnp.abs(cblk - border).sum()
        sad_h = jnp.where(x > 0, sad_h_wrap, sad_h_border)
        sad_v_wrap = ((cblk - pred_v) & 255).sum()
        sad_v_border = jnp.abs(cblk - border).sum()
        sad_v = jnp.where(y > 0, sad_v_wrap, sad_v_border)
        mode = jnp.where(sad_h < sad_v, 0, 1).astype(jnp.int32)
        pred = jnp.where(mode == 0, pred_h, pred_v)
        mae_sum = jnp.where(mode == 0, sad_h, sad_v)

        # --- transform / quantize / reconstruct at the row QP ---
        Q = qmats[qp]
        coeffs = T.forward_coeffs(cblk - pred, bs, exact)
        q = T.quantize(coeffs, Q)
        recon_blk, _ = T.reconstruct_mode(q, Q, pred, bs, exact)
        recon = jax.lax.dynamic_update_slice(recon, recon_blk.astype(jnp.int32), (y, x))
        # artifact plane: int16 residual stored into a uint8 frame wraps
        # mod 256 (reference IFrame.py:30,57)
        res_u8 = ((cblk - pred) & 255).astype(jnp.uint8)
        return (recon, y, qp), (q.astype(jnp.int16), mode, mae_sum, res_u8)

    def row_step(carry, i):
        recon, budget = carry
        if rc1:
            qp = _select_qp_rc1(budget, nbr - i, tbl_qps, tbl_bits)
        else:
            qp = row_qps_in[i]
        y = i * bs
        (recon, _, _), (qrow, modes, maes, res_row) = jax.lax.scan(
            block_step, (recon, y, qp), jnp.arange(nbc, dtype=jnp.int32)
        )
        # exact row cost: qp_diff + per-block modes + DCT coefficients
        zz_rows = bitlen.zigzag_rows(qrow.reshape(nbc, bs * bs), bs)
        dct_bits = bitlen.rle_block_bits(zz_rows).sum()
        pred_bits = bitlen.golomb_len(qp - initial_qp) + bitlen.intra_mode_bits(modes).sum()
        row_bits = dct_bits + pred_bits
        budget = budget - row_bits.astype(jnp.float32)
        return (recon, budget), (qrow, modes, maes, qp, row_bits, res_row)

    recon0 = jnp.zeros((h, w), dtype=jnp.int32)
    (recon, _), (qrows, modes, maes, row_qps, row_bits, res_rows) = jax.lax.scan(
        row_step, (recon0, budget0), jnp.arange(nbr, dtype=jnp.int32)
    )
    # qrows: [nbr, nbc, bs, bs] -> [H, W]
    qdct = qrows.transpose(0, 2, 1, 3).reshape(h, w)
    residual_u8 = res_rows.transpose(0, 2, 1, 3).reshape(h, w)
    smalls = jnp.concatenate([
        modes.reshape(-1), maes.reshape(-1),
        row_qps.astype(jnp.int32), row_bits.astype(jnp.int32),
    ])
    recon_u8 = recon.astype(jnp.uint8)
    if emit_halfpel:
        from .interp import build_half_pel

        return recon_u8, build_half_pel(recon_u8), residual_u8, qdct, smalls
    return recon_u8, None, residual_u8, qdct, smalls


@partial(jax.jit, static_argnames=("bs", "emit_halfpel", "exact"))
def intra_decode_frame(qdct: jnp.ndarray, modes: jnp.ndarray, row_qps: jnp.ndarray,
                       bs: int, emit_halfpel: bool = False, exact: bool = False):
    """Decoder-side intra reconstruction (reference IFrame.py:85-114): same
    scan, predictor chosen by the decoded mode."""
    h, w = qdct.shape
    nbr, nbc = h // bs, w // bs
    d = jnp.asarray(T.dct_matrix(bs))
    qmats = jnp.asarray(T.quant_matrices(bs))
    qdct_i = qdct.astype(jnp.int32)

    def block_step(carry, j):
        recon, y, i = carry
        x = j * bs
        Q = qmats[row_qps[i]]
        coffs = jax.lax.dynamic_slice(qdct_i, (y, x), (bs, bs))
        left_col = jax.lax.dynamic_slice(recon, (y, jnp.maximum(x - 1, 0)), (bs, 1))
        pred_h = jnp.where(
            x > 0,
            jnp.broadcast_to(left_col[:, 0][None, :], (bs, bs)),
            jnp.full((bs, bs), 128, dtype=jnp.int32),
        )
        top_row = jax.lax.dynamic_slice(recon, (jnp.maximum(y - 1, 0), x), (1, bs))
        pred_v = jnp.where(
            y > 0,
            jnp.broadcast_to(top_row[0][:, None], (bs, bs)),
            jnp.full((bs, bs), 128, dtype=jnp.int32),
        )
        pred = jnp.where(modes[i, j] == 0, pred_h, pred_v)
        blk, _ = T.reconstruct_mode(coffs, Q, pred, bs, exact)
        recon = jax.lax.dynamic_update_slice(recon, blk.astype(jnp.int32), (y, x))
        return (recon, y, i), None

    def row_step(recon, i):
        (recon, _, _), _ = jax.lax.scan(
            block_step, (recon, i * bs, i), jnp.arange(nbc, dtype=jnp.int32)
        )
        return recon, None

    recon0 = jnp.zeros((h, w), dtype=jnp.int32)
    recon, _ = jax.lax.scan(row_step, recon0, jnp.arange(nbr, dtype=jnp.int32))
    decoded = recon.astype(jnp.uint8)
    if emit_halfpel:
        from .interp import build_half_pel

        return decoded, build_half_pel(decoded)
    return decoded, None
