"""Golden I-/P-frame codecs (reference encoder/Frame.py, IFrame.py, PFrame.py).

State is held in one small ``GoldenFrame`` record rather than a class
hierarchy; encode/decode are free functions.  All observable outputs —
bitstream bits, reconstructed/residual/quantized planes (including their
wrapping dtypes), per-row bit counts, RC decisions, MV fields, metrics — are
bit-identical to the reference.
"""

from statistics import mean

import numpy as np

from ..entropy import (
    EOB_MARKER,
    BitWriter,
    symbols_to_bits,
    exp_golomb_decode,
    rle_decode,
    rle_encode_blocks,
)
from ..entropy.zigzag import zigzag_indices, inverse_zigzag_indices
from ..rc.rate_control import (
    bit_budget_per_frame,
    calculate_constant_row_bit_budget,
    calculate_proportional_row_bit_budget,
    find_rc_qp_for_row,
)
from ..utils.frame_utils import pad_with_zeros
from ..utils.logger import get_logger
from . import dct as gdct
from . import intra as gintra
from . import me as gme

logger = get_logger()

INTER, INTRA = 0, 1  # PredictionMode values (reference PredictionMode.py:4-9)


class GoldenFrame:
    """Mutable per-frame state (mirrors reference Frame attributes, Frame.py:25-48)."""

    def __init__(self, mode, curr_frame=None, reference_frames=None,
                 interpolated_reference_frames=None):
        self.prediction_mode = mode
        self.curr_frame = curr_frame
        self.reference_frames = reference_frames
        self.interpolated_reference_frames = interpolated_reference_frames

        self.reconstructed_frame = None
        self.residual_frame = None
        self.residual_wo_mc_frame = None
        self.quantized_dct_residual_frame = None
        self.intra_modes = None
        self.mv_field = {}

        self.pred_writer = BitWriter()
        self.dct_writer = BitWriter()
        self.rc_qp_per_row = []
        self.bits_per_row = []
        self.bit_budget = 0
        self.scaling_factor = 1
        self.is_first_pass = True
        self.prev_frame = None
        self.prev_pass_frame = None
        self.index = 0
        self.avg_mae = None
        self.total_mae_comparisons = 0

    def is_iframe(self):
        return self.prediction_mode == INTRA

    def is_pframe(self):
        return self.prediction_mode == INTER


def _prev_frame_avg_qp(frame, ec):
    """``int(mean(prev.rc_qp_per_row) - 0.1) + 1`` (reference IFrame.py:35).

    The reference raises StatisticsError when the previous frame never ran
    rate control (RCflag=0 multi-GOP runs); by default we fall back to the
    config QP instead (``strict_reference_crashes`` restores the crash).
    """
    rows = frame.prev_frame.rc_qp_per_row if frame.prev_frame else []
    if not rows:
        if getattr(ec, "strict_reference_crashes", False):
            mean(rows)  # raises StatisticsError like the reference
        rows = [ec.quantization_factor]
    return int(mean(rows) - 0.1) + 1


def _get_rc_qp(frame, ec, prev_frame_avg_qp, rc_qp, row_idx):
    """Per-row QP selection (reference Frame.py:168-188).

    ``frame_type`` is always 'I' — the reference's
    ``'I' if self.prediction_mode.INTRA_FRAME else 'P'`` is a truthy enum
    member, so the 'P' branch is unreachable (Frame.py:169).
    """
    frame_type = "I"
    if ec.RCflag:
        if ec.RCflag == 1:
            row_bit_budget = calculate_constant_row_bit_budget(frame.bit_budget, row_idx, ec)
            rc_qp = find_rc_qp_for_row(row_bit_budget, ec.rc_lookup_table, frame_type)
        if ec.RCflag > 1:
            if frame.is_first_pass:
                rc_qp = prev_frame_avg_qp
            else:
                row_bit_budget, _ = calculate_proportional_row_bit_budget(frame, row_idx, ec)
                rc_qp = find_rc_qp_for_row(
                    row_bit_budget, ec.rc_lookup_table, frame_type,
                    scaling_factor=frame.scaling_factor,
                )
        frame.rc_qp_per_row.append(rc_qp)
    return rc_qp


def _encode_dct_row(frame, row_idx, ec):
    """Zigzag + RLE + exp-Golomb one block row, EOB per block
    (reference Frame.py:61-75), vectorized."""
    bs = ec.block_size
    row = frame.quantized_dct_residual_frame[row_idx * bs : (row_idx + 1) * bs, :]
    n_cols = row.shape[1] // bs
    blocks = (
        row.reshape(bs, n_cols, bs).swapaxes(0, 1).reshape(n_cols, bs * bs)
    )
    zz = blocks[:, zigzag_indices(bs)]
    symbols = rle_encode_blocks(zz, EOB_MARKER)
    frame.dct_writer.extend(symbols_to_bits(symbols))


def _row_bits_accounting(frame, prev_lens):
    """Track per-row bits and decrement the budget (reference IFrame.py:63-70)."""
    dct_len, pred_len = len(frame.dct_writer), len(frame.pred_writer)
    row_bits = (dct_len - prev_lens[0]) + (pred_len - prev_lens[1])
    frame.bit_budget -= row_bits
    frame.bits_per_row.append(row_bits)
    return (dct_len, pred_len)


# ---------------------------------------------------------------------------
# I-frame
# ---------------------------------------------------------------------------

def encode_iframe(frame: GoldenFrame, ec):
    """Reference IFrame.encode_mc_q_dct (IFrame.py:22-83)."""
    curr = frame.curr_frame
    bs = ec.block_size
    height, width = curr.shape

    frame.intra_modes = []
    frame.reconstructed_frame = np.zeros_like(curr)  # uint8
    residual_plane = np.zeros_like(curr)  # uint8 — wraps on store (quirk, IFrame.py:30)
    frame.quantized_dct_residual_frame = np.zeros_like(curr, dtype=np.int16)

    rc_qp = ec.quantization_factor
    initial_qp = ec.quantization_factor  # prev_rc_qp never advances (IFrame.py:71-72)
    prev_frame_avg_qp = _prev_frame_avg_qp(frame, ec)

    mae_sum = 0.0
    prev_lens = (0, 0)
    for y in range(0, height, bs):
        row_idx = y // bs
        rc_qp = _get_rc_qp(frame, ec, prev_frame_avg_qp, rc_qp, row_idx)
        for x in range(0, width, bs):
            curr_block = curr[y : y + bs, x : x + bs]
            pred, mode, block_mae = gintra.select_intra_mode(
                curr_block, frame.reconstructed_frame, x, y, bs
            )
            residual = np.subtract(curr_block.astype(np.int16), np.asarray(pred).astype(np.int16))
            exact = getattr(ec, "exact_transform", False)
            qcoffs, Q = gdct.apply_dct_and_quantization(residual, bs, rc_qp, exact=exact)
            recon_block, _ = gdct.reconstruct_block(qcoffs, Q, pred, exact=exact)

            frame.intra_modes.append(mode)
            mae_sum += block_mae
            frame.total_mae_comparisons += 2  # reference params.py:63
            frame.reconstructed_frame[y : y + bs, x : x + bs] = recon_block
            frame.quantized_dct_residual_frame[y : y + bs, x : x + bs] = qcoffs
            residual_plane[y : y + bs, x : x + bs] = residual  # uint8 wrap

        # per-row entropy: [qp_diff, modes...] then DCT coefficients
        row_syms = [rc_qp - initial_qp] + frame.intra_modes[
            row_idx * (width // bs) : (row_idx + 1) * (width // bs)
        ]
        frame.pred_writer.extend(symbols_to_bits(np.asarray(row_syms)))
        _encode_dct_row(frame, row_idx, ec)
        prev_lens = _row_bits_accounting(frame, prev_lens)

    frame.avg_mae = mae_sum / ((height // bs) * (width // bs))
    frame.residual_frame = residual_plane
    frame.residual_wo_mc_frame = residual_plane


def decode_iframe(frame: GoldenFrame, frame_shape, ec):
    """Reference IFrame.decode_mc_q_dct (IFrame.py:85-114)."""
    bs = ec.block_size
    height, width = frame_shape
    recon = np.zeros((height, width), dtype=np.uint8)
    n_cols = width // bs
    for y in range(0, height, bs):
        Q = gdct.generate_quantization_matrix(bs, frame.rc_qp_per_row[y // bs])
        for x in range(0, width, bs):
            coffs = frame.quantized_dct_residual_frame[y : y + bs, x : x + bs]
            if getattr(ec, "exact_transform", False):
                idct_res = gdct.apply_idct_2d_exact(
                    np.asarray(coffs, dtype=np.int64) * Q.astype(np.int64))
            else:
                idct_res = gdct.apply_idct_2d(gdct.rescale_block(coffs, Q))
            mode = frame.intra_modes[(y // bs) * n_cols + (x // bs)]
            pred = gintra.predict_for_mode(mode, recon, x, y, bs)
            block = np.clip(np.round(idct_res + pred).astype(np.int16), 0, 255).astype(np.uint8)
            recon[y : y + bs, x : x + bs] = block
    frame.curr_frame = recon
    return recon


def decode_iframe_prediction_data(frame: GoldenFrame, data: bytes, params):
    """Reference IFrame.entropy_decode_prediction_data (IFrame.py:141-171)."""
    ec = params.encoder_config
    from ..utils.frame_utils import padded_dims

    pw, ph = padded_dims(params.width, params.height, ec.block_size)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    blocks_in_row = pw // ec.block_size
    num_rows = ph // ec.block_size
    modes = []
    pos = 0
    for _ in range(num_rows):
        qp_diff, pos = exp_golomb_decode(bits, pos)
        if pos is None:
            break
        frame.rc_qp_per_row.append(ec.quantization_factor + qp_diff)
        for _ in range(blocks_in_row):
            mode, pos = exp_golomb_decode(bits, pos)
            if pos is None:
                break
            modes.append(mode)
        if pos is None:
            break
    frame.intra_modes = modes
    return modes


# ---------------------------------------------------------------------------
# P-frame
# ---------------------------------------------------------------------------

def encode_pframe(frame: GoldenFrame, ec):
    """Reference PFrame.encode_mc_q_dct (PFrame.py:29-97)."""
    curr = frame.curr_frame
    bs = ec.block_size
    height, width = curr.shape
    num_blocks = (height // bs) * (width // bs)

    mv_field = {(0, 0): [0, 0]}
    frame.reconstructed_frame = np.zeros_like(curr, dtype=np.uint8)
    residual_w_mc = np.zeros_like(curr, dtype=np.int8)  # int8 wrap (quirk, PFrame.py:39)
    residual_wo_mc = np.zeros_like(curr, dtype=np.int8)
    frame.quantized_dct_residual_frame = np.zeros_like(curr, dtype=np.int16)

    rc_qp = ec.quantization_factor
    initial_qp = ec.quantization_factor
    prev_frame_avg_qp = _prev_frame_avg_qp(frame, ec) if ec.RCflag > 1 else 0

    prev_block_cords = (0, 0)
    mae_sum = 0.0
    prev_lens = (0, 0)
    for y in range(0, height, bs):
        row_idx = y // bs
        rc_qp = _get_rc_qp(frame, ec, prev_frame_avg_qp, rc_qp, row_idx)
        for x in range(0, width, bs):
            curr_block = curr[y : y + bs, x : x + bs].astype(np.int16)
            mvp = mv_field[prev_block_cords]
            if ec.fastME:
                mv, best_mae, comparisons = gme.fast_search(
                    curr_block, (x, y), mvp,
                    frame.reference_frames, frame.interpolated_reference_frames, ec, 0,
                )
            else:
                mv, best_mae, comparisons = gme.full_search(
                    curr_block, (x, y),
                    frame.reference_frames, frame.interpolated_reference_frames, ec,
                )
            mv_field[(x, y)] = mv

            pred = _predicted_block(frame, mv, (x, y), ec).astype(np.int16)
            residual = np.subtract(curr_block, pred)
            exact = getattr(ec, "exact_transform", False)
            qcoffs, Q = gdct.apply_dct_and_quantization(residual, bs, rc_qp, exact=exact)
            recon_block, idct_residual = gdct.reconstruct_block(qcoffs, Q, pred, exact=exact)

            frame.reconstructed_frame[y : y + bs, x : x + bs] = recon_block
            frame.quantized_dct_residual_frame[y : y + bs, x : x + bs] = qcoffs
            residual_w_mc[y : y + bs, x : x + bs] = idct_residual  # float->int8 wrap
            prev_block = frame.reference_frames[0][y : y + bs, x : x + bs].astype(np.int16)
            residual_wo_mc[y : y + bs, x : x + bs] = np.subtract(curr_block, prev_block)

            mae_sum += best_mae
            frame.total_mae_comparisons += comparisons
            prev_block_cords = (x, y)

        frame.mv_field.update(
            dict(sorted(mv_field.items(), key=lambda kv: (kv[0][1], kv[0][0])))
        )
        _encode_pframe_prediction_row(frame, row_idx, ec, rc_qp - initial_qp)
        _encode_dct_row(frame, row_idx, ec)
        prev_lens = _row_bits_accounting(frame, prev_lens)

    frame.avg_mae = mae_sum / num_blocks
    frame.residual_frame = residual_w_mc
    frame.residual_wo_mc_frame = residual_wo_mc
    return frame


def _predicted_block(frame, mv, cords, ec):
    """Reference PFrame.find_mv_predicted_block (PFrame.py:230-244)."""
    ref_idx = mv[2] if len(frame.reference_frames) > 1 else 0
    pred = gme.get_ref_block_at_mv(
        frame.reference_frames[ref_idx],
        frame.interpolated_reference_frames[ref_idx],
        cords, mv[0], mv[1], ec,
    )
    assert pred.shape == (ec.block_size, ec.block_size)
    return pred


def _encode_pframe_prediction_row(frame, row_idx, ec, rc_qp_diff):
    """Differential MV row coding (reference PFrame.py:136-163).

    ``prev_mv`` is (0,0,0) for the first row and the last block of the
    previous row otherwise; the chain carries across row boundaries.
    """
    bs = ec.block_size
    width = frame.curr_frame.shape[1]  # padded width (see utils.padded_dims)
    block_y = row_idx * bs
    if len(frame.pred_writer) == 0:
        prev_mv = (0, 0, 0)
    else:
        prev_mv = frame.mv_field[(width - bs, block_y - bs)]

    syms = [rc_qp_diff]
    for block_x in range(0, width, bs):
        mv = frame.mv_field[(block_x, block_y)]
        syms.append(mv[0] - prev_mv[0])
        syms.append(mv[1] - prev_mv[1])
        if ec.nRefFrames > 1:
            syms.append(mv[2] - prev_mv[2])
        prev_mv = mv
    frame.pred_writer.extend(symbols_to_bits(np.asarray(syms)))


def decode_pframe_prediction_data(frame: GoldenFrame, data: bytes, params):
    """Reference PFrame.entropy_decode_prediction_data (PFrame.py:166-228)."""
    ec = params.encoder_config
    from ..utils.frame_utils import padded_dims

    bs = ec.block_size
    pw, ph = padded_dims(params.width, params.height, bs)
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    blocks_in_row = pw // bs
    num_rows = ph // bs

    frame.mv_field = {}
    prev_mv = (0, 0, 0)
    pos = 0
    blocks_processed = 0
    for _ in range(num_rows):
        qp_diff, pos = exp_golomb_decode(bits, pos)
        if pos is None:
            break
        frame.rc_qp_per_row.append(ec.quantization_factor + qp_diff)
        for _ in range(blocks_in_row):
            mv_x, pos = exp_golomb_decode(bits, pos)
            if pos is None:
                break
            mv_y, pos = exp_golomb_decode(bits, pos)
            if pos is None:
                break
            if ec.nRefFrames > 1:
                mv_ref, pos = exp_golomb_decode(bits, pos)
                if pos is None:
                    break
            else:
                mv_ref = 0
            mv = (prev_mv[0] + mv_x, prev_mv[1] + mv_y, prev_mv[2] + mv_ref)
            r = (blocks_processed // blocks_in_row) * bs
            c = (blocks_processed % blocks_in_row) * bs
            frame.mv_field[(c, r)] = mv
            prev_mv = mv
            blocks_processed += 1
        if pos is None:
            break
    return frame.mv_field


def decode_pframe(frame: GoldenFrame, frame_shape, ec):
    """Reference construct_frame_from_dct_and_mv (PFrame.py:252-317)."""
    bs = ec.block_size
    height, width = frame.reference_frames[0].shape
    decoded = np.zeros_like(frame.reference_frames[0], dtype=np.uint8)
    for y in range(0, height, bs):
        Q = gdct.generate_quantization_matrix(bs, frame.rc_qp_per_row[y // bs])
        for x in range(0, width, bs):
            coffs = frame.quantized_dct_residual_frame[y : y + bs, x : x + bs]
            if getattr(ec, "exact_transform", False):
                idct_res = gdct.apply_idct_2d_exact(
                    np.asarray(coffs, dtype=np.int64) * Q.astype(np.int64))
            else:
                idct_res = gdct.apply_idct_2d(gdct.rescale_block(coffs, Q))
            mv = frame.mv_field.get((x, y))
            pred = _predicted_block(frame, mv, (x, y), ec)
            block = np.clip(np.round(idct_res + pred).astype(np.int16), 0, 255).astype(np.uint8)
            decoded[y : y + bs, x : x + bs] = block
    return decoded


# ---------------------------------------------------------------------------
# Shared frame-level entropy decode / diagnostics
# ---------------------------------------------------------------------------

def decode_dct_coffs(frame: GoldenFrame, data: bytes, params):
    """Exp-Golomb -> RLE -> inverse zigzag -> merge (reference Frame.py:81-110)."""
    ec = params.encoder_config
    bs = ec.block_size
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    pos = 0
    rle_blocks = []
    current = []
    n = bits.shape[0]
    while pos < n:
        symbol, nxt = exp_golomb_decode(bits, pos)
        if nxt is None:
            break
        pos = nxt
        if symbol == EOB_MARKER:
            rle_blocks.append(current)
            current = []
        else:
            current.append(symbol)

    from ..utils.frame_utils import padded_dims

    inv = inverse_zigzag_indices(bs)
    pw, ph = padded_dims(params.width, params.height, bs)
    n_cols = pw // bs
    out = np.zeros((ph, pw), dtype=int)
    for idx, rle_block in enumerate(rle_blocks):
        coffs = rle_decode(rle_block)
        pad_with_zeros(coffs, bs * bs)
        block = np.asarray(coffs, dtype=np.int64)[inv].reshape(bs, bs)
        r = (idx // n_cols) * bs
        c = (idx % n_cols) * bs
        out[r : r + bs, c : c + bs] = block
    frame.quantized_dct_residual_frame = out
    return out


def get_overage_ratios(frame: GoldenFrame, ec):
    """Consumed vs expected frame bits (reference Frame.py:155-163).

    Returns None when the lookup table lacks the config QP (the reference
    raises KeyError then; ``strict_reference_crashes`` restores that).
    """
    if not frame.is_first_pass:
        raise ValueError("why is overage being called in first pass?")
    bits = len(frame.dct_writer) + len(frame.pred_writer) + 8 * 6
    num_rows = ec.resolution[1] // ec.block_size
    table = ec.rc_lookup_table
    try:
        expected_i = table[ec.quantization_factor]["I"] * num_rows
        expected_p = table[ec.quantization_factor]["P"] * num_rows
    except (KeyError, TypeError):
        if getattr(ec, "strict_reference_crashes", False):
            raise
        return None
    return bits / expected_i, bits / expected_p
