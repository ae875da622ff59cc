"""Golden encode driver (reference encoder/encoder.py:28-206 semantics).

Frame-serial loop: read Y plane -> pad -> first-pass frame (I every I_Period,
clearing the reference deques) -> optional second pass with scene-change
detection (RCflag > 1) -> framed bitstream write -> metrics row -> artifact
dumps -> reference-frame rotation.  Output files are byte-identical to the
reference's.
"""

import csv
import math
import os
import time
from collections import deque
from contextlib import ExitStack

import numpy as np

from ..config import InputParameters
from ..io.fileio import FileIOHelper, write_mv_to_file, write_y_only_frame
from ..metrics.frame_metrics import FrameMetrics
from ..rc.lookup import get_combined_lookup_table, rc_lookup_file_path
from ..rc.rate_control import bit_budget_per_frame
from ..utils.frame_utils import pad_frame, psnr
from ..utils.logger import get_logger
from . import frames as gf
from .interp import build_pre_interpolated_buffer

logger = get_logger()

SCENE_CHANGE_THRESHOLD = 1.3  # reference encoder/encoder.py:30


def _load_rc_table(ec):
    """The reference loads lookups unconditionally (``if RCflag or 1:``,
    encoder.py:39-42); we tolerate missing tables when RC is off, and keep a
    caller-supplied table (calibration for resolutions without shipped CSVs,
    e.g. from rc.lookup.generate_rc_lookup)."""
    if ec.rc_lookup_table is None:
        try:
            ec.rc_lookup_table = get_combined_lookup_table(
                rc_lookup_file_path(ec, "I"), rc_lookup_file_path(ec, "P")
            )
        except FileNotFoundError:
            if ec.RCflag or getattr(ec, "strict_reference_crashes", False):
                raise
            ec.rc_lookup_table = None
    if ec.RCflag and ec.rc_lookup_table:
        # RC may pick any table QP (RateControl.py:34-43), so every entry
        # must be a representable quantization level for this block size —
        # the same bound EncoderConfig.validate enforces on the config QP.
        # The shipped calibration tables satisfy this by construction;
        # reject custom ones that do not, loudly, on every backend.
        max_qp = int(math.log2(ec.block_size)) + 7
        bad = [q for q in ec.rc_lookup_table if q > max_qp]
        if bad:
            raise ValueError(
                f"RC lookup table contains QP(s) {bad} beyond the valid "
                f"range (<= {max_qp}) for block_size {ec.block_size}")


def _first_pass_frame(frame_index, padded, refs, irefs, params, prev_frame):
    """Reference get_first_pass_frame (encoder.py:174-186)."""
    ec = params.encoder_config
    if (frame_index - 1) % ec.I_Period == 0:
        frame = gf.GoldenFrame(gf.INTRA, padded)
        refs.clear()
        irefs.clear()
    else:
        frame = gf.GoldenFrame(gf.INTER, padded, refs, irefs)
    frame.is_first_pass = True
    frame.prev_frame = prev_frame
    frame.index = frame_index
    frame.bit_budget = bit_budget_per_frame(ec)
    return frame


def _second_pass_frame(padded, refs, irefs, params, first_pass, is_scene_change, prev_frame):
    """Reference get_second_pass_frame (encoder.py:188-201)."""
    ec = params.encoder_config
    if is_scene_change or first_pass.is_iframe():
        refs.clear()
        irefs.clear()
        frame = gf.GoldenFrame(gf.INTRA, padded)
    else:
        frame = gf.GoldenFrame(gf.INTER, padded, refs, irefs)
    frame.is_first_pass = False
    frame.prev_frame = prev_frame
    frame.index = first_pass.index
    frame.bit_budget = bit_budget_per_frame(ec)
    frame.prev_pass_frame = first_pass
    # NOTE: the reference sets the scene-change scaling factor on the *first*
    # pass frame (encoder.py:94) but never copies it to the second-pass frame,
    # whose scaling_factor stays 1 (Frame.py:48) — the knob is dead code and we
    # preserve that.
    return frame


def _encode_frame(frame, ec):
    if frame.is_iframe():
        gf.encode_iframe(frame, ec)
    else:
        gf.encode_pframe(frame, ec)


def encode_video(params: InputParameters, results_csv_path: str | None = "results.csv"):
    ec = params.encoder_config
    file_io = FileIOHelper(params)
    y_size = params.width * params.height

    refs = deque(maxlen=ec.nRefFrames)
    refs.append(np.full((params.height, params.width), 128, dtype=np.uint8))
    irefs = deque(maxlen=ec.nRefFrames)
    irefs.append(build_pre_interpolated_buffer(refs[0]))

    _load_rc_table(ec)

    with ExitStack() as stack:
        f_in = stack.enter_context(open(params.y_only_file, "rb"))
        mv_fh = stack.enter_context(open(file_io.get_mv_file_name(), "wt"))
        qdct_fh = stack.enter_context(open(file_io.get_quant_dct_coff_fh_file_name(), "wb"))
        res_w_mc_fh = stack.enter_context(open(file_io.get_residual_w_mc_file_name(), "wb"))
        res_wo_mc_fh = stack.enter_context(open(file_io.get_residual_wo_mc_file_name(), "wb"))
        recon_fh = stack.enter_context(open(file_io.get_mc_reconstructed_file_name(), "wb"))
        encoded_fh = stack.enter_context(open(file_io.get_encoded_file_name(), "wb"))
        metrics_fh = stack.enter_context(
            open(file_io.get_metrics_csv_file_name(), "wt", newline="")
        )
        metrics_writer = csv.writer(metrics_fh)
        metrics_writer.writerow(FrameMetrics.get_header())

        prev_frame = gf.GoldenFrame(gf.INTER)
        prev_frame.rc_qp_per_row = [ec.quantization_factor]  # seed (encoder.py:72-73)

        frame_index = 0
        start_time = time.time()
        while True:
            frame_start = time.time()
            start_of_block_idx = encoded_fh.tell()
            frame_index += 1
            buf = f_in.read(y_size)
            if not buf or frame_index > params.frames_to_process:
                break
            y_plane = np.frombuffer(buf, dtype=np.uint8).reshape(params.height, params.width)
            padded = pad_frame(y_plane, ec.block_size)

            frame = _first_pass_frame(frame_index, padded, refs, irefs, params, prev_frame)
            _encode_frame(frame, ec)

            overage = gf.get_overage_ratios(frame, ec)
            if ec.RCflag > 1:
                is_scene_change = False
                if frame.is_pframe() and overage is not None and overage[1] > SCENE_CHANGE_THRESHOLD:
                    frame.scaling_factor = (1 - overage[1]) * 0.95  # negative (quirk)
                    is_scene_change = True
                frame = _second_pass_frame(
                    padded, refs, irefs, params, frame, is_scene_change, prev_frame
                )
                _encode_frame(frame, ec)

            frame_enc_time = time.time() - frame_start

            # bitstream framing (reference encoder.py:104-121)
            encoded_fh.write(frame.prediction_mode.to_bytes(1))
            pred_bytes = frame.pred_writer.tobytes()
            encoded_fh.write(frame.pred_writer.nbytes().to_bytes(2))
            encoded_fh.write(pred_bytes)
            dct_bytes = frame.dct_writer.tobytes()
            encoded_fh.write(frame.dct_writer.nbytes().to_bytes(3))
            encoded_fh.write(dct_bytes)

            frame_psnr = psnr(frame.curr_frame, frame.reconstructed_frame)
            encoded_frame_size = encoded_fh.tell() - start_of_block_idx
            metrics_writer.writerow(
                FrameMetrics(
                    frame_index, frame.prediction_mode, frame.avg_mae,
                    frame.total_mae_comparisons, frame_psnr, encoded_frame_size,
                    encoded_fh.tell() * 8, frame_enc_time, time.time() - start_time,
                ).to_csv_row()
            )
            logger.info(
                f"{frame_index:2}: {'INTRA' if frame.is_iframe() else 'INTER'} "
                f" mae [{round(frame.avg_mae, 2):6.2f}] "
                f"psnr [{round(frame_psnr, 2):6.2f}], "
                f"size: [{encoded_frame_size:6}]"
            )

            # per-frame artifacts (reference Frame.py:119-130)
            write_y_only_frame(res_w_mc_fh, frame.residual_frame)
            write_y_only_frame(res_wo_mc_fh, frame.residual_wo_mc_frame)
            write_y_only_frame(qdct_fh, frame.quantized_dct_residual_frame)
            write_y_only_frame(recon_fh, frame.reconstructed_frame)
            if frame.is_pframe():
                write_mv_to_file(mv_fh, frame.mv_field)
            else:
                mv_fh.write("\n")

            refs.append(frame.reconstructed_frame)
            irefs.append(build_pre_interpolated_buffer(frame.reconstructed_frame))
            prev_frame = frame

    elapsed = time.time() - start_time
    _append_throughput(params, elapsed, results_csv_path)
    return


def _append_throughput(params, elapsed, results_csv_path):
    """Whole-run throughput line (reference encoder.py:159-169)."""
    ec = params.encoder_config
    num_blocks = (params.height // ec.block_size) * (params.width // ec.block_size)
    num_comparisons = num_blocks * (2 * ec.search_range + 1) ** 2
    n = params.frames_to_process
    result = (
        f"{num_comparisons / elapsed:9.3f} | {num_comparisons:7d} | "
        f"{num_blocks / elapsed:7.3f} |  {num_blocks:5d} | {n / elapsed:6.2f} | "
        f"{n:3d} | {elapsed:6.3f} | {ec.block_size:2d} | {ec.search_range:2d} |\n"
    )
    logger.info(result)
    if results_csv_path:
        with open(results_csv_path, "at") as f:
            f.write(result)
