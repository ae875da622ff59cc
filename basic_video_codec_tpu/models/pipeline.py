"""TPU encode/decode drivers.

The host loop is thin: per frame it dispatches ONE jitted device program
(I-frame row scan or P-frame ME+DCT+RC pipeline), then finalizes entropy bits
with vectorized NumPy over the device-produced integer planes.  Reference
frames and their half-pel buffers live on device between frames.

Output artifacts, bitstream framing, metrics rows and RC decisions are
identical to the golden model / reference (see golden/encoder.py for the
framing spec); the only permitted divergence is the documented float32-DCT
rounding edge (ops/transform.py).
"""

import csv
import os
import time
from statistics import mean

import jax.numpy as jnp
import numpy as np

from ..config import InputParameters
from ..entropy import (
    EOB_MARKER,
    BitWriter,
    decode_symbols,
    rle_decode,
    rle_encode_blocks,
    symbols_to_bits,
)
from ..entropy.zigzag import inverse_zigzag_indices, zigzag_indices
from ..golden.encoder import SCENE_CHANGE_THRESHOLD, _load_rc_table
from ..io.fileio import FileIOHelper, write_mv_to_file, write_y_only_frame
from ..metrics.frame_metrics import FrameMetrics
from ..ops.interp import build_half_pel
from ..ops.intra import intra_decode_frame, intra_encode_frame
from ..rc.rate_control import (
    bit_budget_per_frame,
    calculate_proportional_row_bit_budget,
    find_rc_qp_for_row,
)
from ..utils.frame_utils import pad_frame, psnr
from ..utils.logger import get_logger
from .pframe import pframe_decode, pframe_encode

logger = get_logger()

INTER, INTRA = 0, 1


class _FrameResult:
    """Host-side record of one encoded frame (pass)."""

    __slots__ = (
        "mode", "curr", "recon", "qdct", "modes", "mvs", "row_qps", "row_bits",
        "bits_per_row", "rc_qp_per_row", "avg_mae", "comparisons", "pred_writer",
        "dct_writer", "res_w_mc", "res_wo_mc", "mv_field", "is_first_pass",
        "prev_pass", "scaling_factor",
    )

    def is_iframe(self):
        return self.mode == INTRA


def _table_arrays(ec):
    """RC lookup as device-friendly arrays (ascending QP; 'I' column — the
    reference always prices rows with the I table, Frame.py:169)."""
    table = ec.rc_lookup_table
    if not table:
        return np.zeros(1, np.int32), np.zeros(1, np.float32)
    qps = np.asarray(sorted(table.keys()), dtype=np.int32)
    bits = np.asarray([table[int(q)]["I"] for q in qps], dtype=np.float32)
    return qps, bits


def _prev_avg_qp(prev_rows, ec):
    """``int(mean(prev.rc_qp_per_row) - 0.1) + 1`` (reference IFrame.py:35)
    with the non-strict fallback for empty history."""
    rows = prev_rows or None
    if rows is None:
        if getattr(ec, "strict_reference_crashes", False):
            mean([])  # StatisticsError, like the reference
        rows = [ec.quantization_factor]
    return int(mean(rows) - 0.1) + 1


def _row_qps_for_pass(ec, is_first_pass, prev_rows, prev_pass_bits, nbr):
    """Host-side per-row QP plan for all cases except RC1 (which runs
    in-scan on device).  Returns (row_qps int32 [nbr] or None-for-RC1, rc1)."""
    qp = ec.quantization_factor
    if ec.RCflag == 0:
        return np.full(nbr, qp, np.int32), False
    if ec.RCflag == 1:
        return np.full(nbr, qp, np.int32), True  # array unused on device
    if is_first_pass:
        return np.full(nbr, _prev_avg_qp(prev_rows, ec), np.int32), False
    # second pass: proportional row budgets from the first pass (RateControl.py:23-30)
    total = sum(prev_pass_bits)
    out = np.empty(nbr, np.int32)
    for i in range(nbr):
        row_budget = bit_budget_per_frame(ec) * (prev_pass_bits[i] / total)
        out[i] = find_rc_qp_for_row(row_budget, ec.rc_lookup_table, "I")
    return out, False


def _encode_frame_device(ec, mode, padded, refs_dev, irefs_dev, row_qps, rc1):
    bs = ec.block_size
    h, w = padded.shape
    nbr = h // bs
    tbl_qps, tbl_bits = _table_arrays(ec)
    budget0 = jnp.float32(bit_budget_per_frame(ec)) if rc1 else jnp.float32(0)
    initial_qp = jnp.int32(ec.quantization_factor)
    curr_dev = jnp.asarray(padded)

    r = _FrameResult()
    r.mode = mode
    r.curr = padded
    if mode == INTRA:
        recon, qdct, modes, maes, rq, rbits, res_u8 = intra_encode_frame(
            curr_dev, jnp.asarray(row_qps), budget0, jnp.asarray(tbl_qps),
            jnp.asarray(tbl_bits), initial_qp, bs, rc1,
        )
        r.modes = np.asarray(modes)
        r.mvs = None
        r.avg_mae = float(np.asarray(maes, dtype=np.float64).sum() / (bs * bs) / maes.size)
        r.comparisons = 2 * maes.size  # reference params.py:63
        r.res_w_mc = np.asarray(res_u8)
        r.res_wo_mc = r.res_w_mc
    else:
        refs_stack = jnp.stack(refs_dev)
        irefs_stack = jnp.stack(irefs_dev)
        recon, qdct, mvs, sads, comps, rq, rbits, res_w, res_wo = pframe_encode(
            curr_dev, refs_stack, irefs_stack, jnp.asarray(row_qps), budget0,
            jnp.asarray(tbl_qps), jnp.asarray(tbl_bits), initial_qp,
            bs, max(ec.search_range, 0), rc1, ec.fastME, ec.fracMeEnabled,
            ec.nRefFrames > 1,
        )
        r.modes = None
        r.mvs = np.asarray(mvs)
        r.avg_mae = float(np.asarray(sads, dtype=np.float64).sum() / (bs * bs) / sads.size)
        r.comparisons = int(np.asarray(comps, dtype=np.int64).sum())
        r.res_w_mc = np.asarray(res_w)
        r.res_wo_mc = np.asarray(res_wo)
        r.mv_field = {
            (j * bs, i * bs): [int(r.mvs[i, j, 0]), int(r.mvs[i, j, 1]), int(r.mvs[i, j, 2])]
            for i in range(r.mvs.shape[0])
            for j in range(r.mvs.shape[1])
        }
    r.recon = recon  # stays on device for the reference deque
    r.qdct = np.asarray(qdct)
    r.row_qps = np.asarray(rq)
    r.bits_per_row = np.asarray(rbits).tolist()
    r.rc_qp_per_row = r.row_qps.tolist() if ec.RCflag else []
    _finalize_entropy(r, ec, nbr)
    return r


def _finalize_entropy(r, ec, nbr):
    """Vectorized host bit packing from device-produced integer planes."""
    bs = ec.block_size
    h, w = r.qdct.shape
    nbc = w // bs
    qp_diffs = r.row_qps.astype(np.int64) - ec.quantization_factor

    # prediction data
    if r.mode == INTRA:
        syms = np.hstack([qp_diffs[:, None], r.modes.astype(np.int64)]).ravel()
    else:
        k = 3 if ec.nRefFrames > 1 else 2
        flat = r.mvs.reshape(-1, 3).astype(np.int64)
        prev = np.vstack([np.zeros(3, np.int64), flat[:-1]])
        diffs = (flat - prev)[:, :k].reshape(nbr, nbc * k)
        syms = np.hstack([qp_diffs[:, None], diffs]).ravel()
    r.pred_writer = BitWriter()
    r.pred_writer.extend(symbols_to_bits(syms))

    # DCT coefficients: zigzag + RLE + exp-Golomb for the whole frame at once
    blocks = (
        r.qdct.reshape(nbr, bs, nbc, bs).swapaxes(1, 2).reshape(nbr * nbc, bs * bs)
    )
    zz = blocks[:, zigzag_indices(bs)]
    r.dct_writer = BitWriter()
    r.dct_writer.extend(symbols_to_bits(rle_encode_blocks(zz, EOB_MARKER)))

    # cross-check the device's exact row pricing against the real bits
    assert len(r.dct_writer) + len(r.pred_writer) == sum(r.bits_per_row), (
        "device bit pricing diverged from host entropy coder"
    )


def encode_video(params: InputParameters, results_csv_path: str | None = "results.csv"):
    ec = params.encoder_config
    file_io = FileIOHelper(params)
    y_size = params.width * params.height
    bs = ec.block_size

    _load_rc_table(ec)

    refs_dev = [jnp.full((params.height, params.width), 128, dtype=jnp.uint8)]
    irefs_dev = [build_half_pel(refs_dev[0])]

    with open(params.y_only_file, "rb") as f_in, \
         open(file_io.get_mv_file_name(), "wt") as mv_fh, \
         open(file_io.get_quant_dct_coff_fh_file_name(), "wb") as qdct_fh, \
         open(file_io.get_residual_w_mc_file_name(), "wb") as res_w_fh, \
         open(file_io.get_residual_wo_mc_file_name(), "wb") as res_wo_fh, \
         open(file_io.get_mc_reconstructed_file_name(), "wb") as recon_fh, \
         open(file_io.get_encoded_file_name(), "wb") as encoded_fh, \
         open(file_io.get_metrics_csv_file_name(), "wt", newline="") as metrics_fh:

        metrics_writer = csv.writer(metrics_fh)
        metrics_writer.writerow(FrameMetrics.get_header())

        prev_rc_rows = [ec.quantization_factor]  # seed (reference encoder.py:72-73)
        frame_index = 0
        start_time = time.time()
        while True:
            frame_start = time.time()
            start_idx = encoded_fh.tell()
            frame_index += 1
            buf = f_in.read(y_size)
            if not buf or frame_index > params.frames_to_process:
                break
            padded = pad_frame(
                np.frombuffer(buf, dtype=np.uint8).reshape(params.height, params.width), bs
            )
            nbr = padded.shape[0] // bs

            is_i = (frame_index - 1) % ec.I_Period == 0
            if is_i:
                refs_dev.clear()
                irefs_dev.clear()
            row_qps, rc1 = _row_qps_for_pass(ec, True, prev_rc_rows, None, nbr)
            r = _encode_frame_device(
                ec, INTRA if is_i else INTER, padded, refs_dev, irefs_dev, row_qps, rc1
            )
            r.is_first_pass = True

            if ec.RCflag > 1:
                overage = _overage(r, ec)
                scene_change = (
                    not r.is_iframe()
                    and overage is not None
                    and overage[1] > SCENE_CHANGE_THRESHOLD
                )
                second_i = scene_change or r.is_iframe()
                if second_i:
                    refs_dev.clear()
                    irefs_dev.clear()
                row_qps2, rc1_2 = _row_qps_for_pass(ec, False, prev_rc_rows, r.bits_per_row, nbr)
                r = _encode_frame_device(
                    ec, INTRA if second_i else INTER, padded, refs_dev, irefs_dev,
                    row_qps2, rc1_2,
                )
                r.is_first_pass = False

            frame_enc_time = time.time() - frame_start

            # framing (reference encoder.py:104-121)
            encoded_fh.write(r.mode.to_bytes(1))
            encoded_fh.write(r.pred_writer.nbytes().to_bytes(2))
            encoded_fh.write(r.pred_writer.tobytes())
            encoded_fh.write(r.dct_writer.nbytes().to_bytes(3))
            encoded_fh.write(r.dct_writer.tobytes())

            recon_np = np.asarray(r.recon)
            frame_psnr = psnr(r.curr, recon_np)
            frame_bytes = encoded_fh.tell() - start_idx
            metrics_writer.writerow(
                FrameMetrics(
                    frame_index, r.mode, r.avg_mae, r.comparisons, frame_psnr,
                    frame_bytes, encoded_fh.tell() * 8, frame_enc_time,
                    time.time() - start_time,
                ).to_csv_row()
            )
            logger.info(
                f"{frame_index:2}: {'INTRA' if r.is_iframe() else 'INTER'} "
                f" mae [{round(r.avg_mae, 2):6.2f}] psnr [{round(frame_psnr, 2):6.2f}], "
                f"size: [{frame_bytes:6}]"
            )

            write_y_only_frame(res_w_fh, r.res_w_mc)
            write_y_only_frame(res_wo_fh, r.res_wo_mc)
            write_y_only_frame(qdct_fh, r.qdct.astype(np.int16))
            write_y_only_frame(recon_fh, recon_np)
            if r.is_iframe():
                mv_fh.write("\n")
            else:
                write_mv_to_file(mv_fh, r.mv_field)

            refs_dev.append(r.recon)
            irefs_dev.append(build_half_pel(r.recon))
            if len(refs_dev) > ec.nRefFrames:
                refs_dev.pop(0)
                irefs_dev.pop(0)
            prev_rc_rows = r.rc_qp_per_row

    elapsed = time.time() - start_time
    from ..golden.encoder import _append_throughput

    _append_throughput(params, elapsed, results_csv_path)


def _overage(r, ec):
    """Frame bits vs lookup expectation (reference Frame.py:155-163)."""
    bits = len(r.dct_writer) + len(r.pred_writer) + 8 * 6
    num_rows = ec.resolution[1] // ec.block_size
    try:
        return (
            bits / (ec.rc_lookup_table[ec.quantization_factor]["I"] * num_rows),
            bits / (ec.rc_lookup_table[ec.quantization_factor]["P"] * num_rows),
        )
    except (KeyError, TypeError):
        if getattr(ec, "strict_reference_crashes", False):
            raise
        return None


# ---------------------------------------------------------------------------
# Decode
# ---------------------------------------------------------------------------

def _parse_prediction(data, ec, params, is_intra):
    """Entropy-decode one frame's prediction payload into planes."""
    bs = ec.block_size
    nbc = ec.resolution[0] // bs
    nbr = ec.resolution[1] // bs
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    per_row = 1 + nbc * (1 if is_intra else (3 if ec.nRefFrames > 1 else 2))
    syms, _ = decode_symbols(bits, max_symbols=nbr * per_row)
    syms = np.asarray(syms, dtype=np.int64).reshape(nbr, per_row)
    row_qps = ec.quantization_factor + syms[:, 0]
    if is_intra:
        return row_qps.astype(np.int32), syms[:, 1:].astype(np.int32), None
    k = 3 if ec.nRefFrames > 1 else 2
    diffs = syms[:, 1:].reshape(-1, k)
    if k == 2:
        diffs = np.hstack([diffs, np.zeros((diffs.shape[0], 1), np.int64)])
    mvs = np.cumsum(diffs, axis=0).reshape(nbr, nbc, 3).astype(np.int32)
    return row_qps.astype(np.int32), None, mvs


def _parse_dct(data, ec, params):
    bs = ec.block_size
    bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    syms, _ = decode_symbols(bits)
    syms = np.asarray(syms, dtype=np.int64)
    # split on EOB markers, RLE-decode each block
    ends = np.flatnonzero(syms == EOB_MARKER)
    starts = np.concatenate([[0], ends[:-1] + 1])
    zz = zigzag_indices(bs)  # flat[zz[k]] = scan[k]
    nbc = params.width // bs
    nbr = params.height // bs
    out = np.zeros((nbr * nbc, bs * bs), dtype=np.int32)
    for idx, (s, e) in enumerate(zip(starts, ends)):
        coffs = rle_decode(syms[s:e].tolist())
        coffs = coffs + [0] * (bs * bs - len(coffs))
        out[idx, zz] = coffs
    return (
        out.reshape(nbr, nbc, bs, bs).swapaxes(1, 2).reshape(nbr * bs, nbc * bs)
    )


def decode_video(params: InputParameters):
    ec = params.encoder_config
    file_io = FileIOHelper(params)
    height, width = params.height, params.width
    bs = ec.block_size

    refs_dev = [jnp.full((height, width), 128, dtype=jnp.uint8)]
    irefs_dev = [build_half_pel(refs_dev[0])]

    with open(file_io.get_mc_reconstructed_file_name(), "rb") as recon_fh, \
         open(file_io.get_encoded_file_name(), "rb") as encoded_fh, \
         open(file_io.get_mc_decoded_file_name(), "wb") as decoded_fh:

        frame_index = 0
        while True:
            frame_index += 1
            mode_byte = encoded_fh.read(1)
            if frame_index > params.frames_to_process or not mode_byte:
                break
            mode = int.from_bytes(mode_byte)
            if mode == INTRA:
                refs_dev.clear()
                irefs_dev.clear()

            pred_len = int.from_bytes(encoded_fh.read(2))
            row_qps, modes, mvs = _parse_prediction(
                encoded_fh.read(pred_len), ec, params, mode == INTRA
            )
            dct_len = int.from_bytes(encoded_fh.read(3))
            qdct = _parse_dct(encoded_fh.read(dct_len), ec, params)

            if mode == INTRA:
                decoded = intra_decode_frame(
                    jnp.asarray(qdct), jnp.asarray(modes), jnp.asarray(row_qps), bs
                )
            else:
                decoded = pframe_decode(
                    jnp.asarray(qdct), jnp.asarray(mvs), jnp.asarray(row_qps),
                    jnp.stack(refs_dev), jnp.stack(irefs_dev), bs, ec.fracMeEnabled,
                )

            decoded_np = np.asarray(decoded)
            ref_plane = np.frombuffer(recon_fh.read(width * height), dtype=np.uint8)
            frame_psnr = psnr(decoded_np, ref_plane.reshape(height, width))
            logger.info(f"{frame_index:2}: psnr [{round(frame_psnr, 2):6.2f}]")

            write_y_only_frame(decoded_fh, decoded_np)
            refs_dev.append(decoded)
            irefs_dev.append(build_half_pel(decoded))
            if len(refs_dev) > ec.nRefFrames:
                refs_dev.pop(0)
                irefs_dev.pop(0)
    logger.info("End decoding")
