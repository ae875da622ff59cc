"""Rate-control studies (reference assign3/*).

* :func:`deliverable` — the reference's default run: CIF, block 16, r=1,
  qp 5, I_Period 21, fastME, RCflag 3 at 2.4 Mbps, 21 frames ->
  encode + plots + decode (assign3/Deliverable.py:14-45).
* :func:`create_lookup_for_seq` / :func:`create_lookups` — RC lookup-table
  calibration: encode a QP sweep, aggregate avg bits per block row into the
  ``{W}_{H}_{bs}_{I|P}.csv`` tables (assign3/Ex1.py:15-51 +
  RateControl/lookup.py:19-76).
* :func:`rc_mode_comparison` — RD/timing comparison across RC modes 0-3 and
  bitrates {7M, 2.4M, 360k} with the per-frame PSNR overlay at 2.4 Mbps
  (assign3/Ex2.py:10-62).
"""

import copy
import math
import os

from ..config import EncoderConfig, InputParameters
from ..io.fileio import FileIOHelper
from ..metrics.frame_metrics import FrameMetrics
from ..metrics.plots import (
    calculate_rd_points_and_times,
    plot_per_frame_psnr,
    plot_rd_curves,
    tabulate_and_export_encoding_times,
)
from ..rc.lookup import generate_rc_lookup
from .pipeline_run import encode_plot_decode


def deliverable(y_only_file, width=352, height=288, num_frames=21,
                target_br=2_400_000, backend="auto", results_csv_path="results.csv"):
    """Reference assign3/Deliverable.main (Deliverable.py:14-45)."""
    ec = EncoderConfig(
        block_size=16, search_range=1, quantization_factor=5, I_Period=21,
        fastME=True, RCflag=3, targetBR=target_br, resolution=(width, height),
        backend=backend,
    )
    params = InputParameters(y_only_file, width, height, ec, num_frames)
    return encode_plot_decode(params, results_csv_path=results_csv_path)


def create_lookup_for_seq(y_only_file, width, height, block_size, i_period,
                          num_frames=21, backend="auto", qps=None, out_path=None):
    """Calibrate one RC lookup table from a QP sweep (assign3/Ex1.py:26-51)."""
    qps = qps if qps is not None else range(int(math.log2(block_size) + 7) + 1)
    metric_rows = {}
    params = None
    for qp in qps:
        ec = EncoderConfig(
            block_size=block_size, search_range=2, I_Period=i_period,
            quantization_factor=qp, resolution=(width, height), backend=backend,
        )
        params = InputParameters(y_only_file, width, height, ec, num_frames)
        csv_path = encode_plot_decode(params, results_csv_path=None, plots=False, decode=False)
        import csv as _csv

        with open(csv_path) as f:
            reader = _csv.reader(f)
            next(reader)
            metric_rows[qp] = [FrameMetrics.from_csv_row(r) for r in reader]
    return generate_rc_lookup(metric_rows, params, output_path=out_path)


def create_lookups(y_only_file, width, height, block_sizes=(8, 16),
                   i_periods=(1, 21), **kw):
    """Calibration sweep over block sizes and I/P table kinds (Ex1.py:15-24)."""
    out = []
    for bs in block_sizes:
        for ip in i_periods:
            out.append(create_lookup_for_seq(y_only_file, width, height, bs, ip, **kw))
    return out


def rc_mode_comparison(y_only_file, width=352, height=288, num_frames=21,
                       qps=(3, 6, 9), bit_rates=(7_000_000, 2_400_000, 360_000),
                       out_dir="results/assign3_dels", backend="auto"):
    """RC modes 0-3 x bitrates RD + timing study (assign3/Ex2.py:10-62)."""
    os.makedirs(out_dir, exist_ok=True)
    base = EncoderConfig(
        16, 2, 21, quantization_factor=6, fastME=True, fracMeEnabled=True,
        resolution=(width, height), backend=backend,
    )

    def cell(rc_mode, qp=None, bit_rate=None):
        ec = copy.deepcopy(base)
        if qp is not None:
            ec.quantization_factor = qp
        if rc_mode:
            ec.RCflag = rc_mode
            ec.targetBR = bit_rate
        return InputParameters(y_only_file, width, height, ec.validate(),
                               num_frames)

    # Build the full mode x rate grid and batch-encode it: the RC0 QP
    # sweep and each RC mode's bitrate sweep vmap into one device program
    # apiece (models/batch.py — budget0 is a batched axis; RC 2/3 groups
    # ride the vmapped fused two-pass program).
    from ..models.batch import encode_videos_batched

    grid = [(0, cell(0, qp=qp), None) for qp in qps]
    for rc_mode in (1, 2, 3):
        grid += [(rc_mode, cell(rc_mode, bit_rate=br), br)
                 for br in bit_rates]
    encode_videos_batched([p for _, p, _ in grid], results_csv_path=None)

    series_collection, times_collection = [], []
    two_m_metric_files = []
    for rc_mode in (0, 1, 2, 3):
        metric_files = []
        for mode, params, br in grid:
            if mode != rc_mode:
                continue
            path = FileIOHelper(params,
                                create_dirs=False).get_metrics_csv_file_name()
            metric_files.append(path)
            if br == 2_400_000:
                two_m_metric_files.append(path)
        rd, times = calculate_rd_points_and_times(metric_files,
                                                  f"RCMode: {rc_mode}")
        series_collection.append(rd)
        times_collection.append(times)

    plot_rd_curves(series_collection, os.path.join(out_dir, "ex2_rd.png"))
    tabulate_and_export_encoding_times(
        series_collection, times_collection, os.path.join(out_dir, "timings.csv"))
    plot_per_frame_psnr(two_m_metric_files, os.path.join(out_dir, "per-frame-psnr.png"),
                        title="Per-Frame PSNR for Bitrate = 2.4 Mbps")
    return series_collection, times_collection
