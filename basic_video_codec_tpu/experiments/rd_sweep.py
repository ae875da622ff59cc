"""RD experiment sweep (reference assign1/ex4_plots.py:131-257).

Sweeps block size x QP x I_Period over the first N frames of a sequence,
records per-frame PSNR/bits plus wall time into
``results/rd_experiment_results.csv`` (same column layout as the reference's
committed results), and renders RD / bit-count plots.
"""

import csv
import os

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt

from ..config import EncoderConfig, InputParameters
from ..io.fileio import FileIOHelper
from ..metrics.plots import read_metrics_from_csv
from ..models.batch import encode_videos_batched

DEFAULT_QPS = {8: [0, 3, 6, 9], 16: [1, 4, 7, 10]}


def run_sweep(
    y_only_file: str,
    width: int = 352,
    height: int = 288,
    block_sizes=(8, 16),
    qp_values=None,
    i_periods=(1, 4, 10),
    search_range: int = 2,
    num_frames: int = 10,
    output_dir: str = "results",
    plots: bool = True,
    backend: str = "auto",
):
    qp_values = qp_values or DEFAULT_QPS
    os.makedirs(output_dir, exist_ok=True)

    # Build every sweep cell up front, then hand the whole set to the
    # batched encoder: cells sharing (block size, I_Period, features) and
    # differing only in QP run as ONE vmapped device program with one
    # shared input upload (models/batch.py) — vs the reference's serial
    # per-cell loop (assign1/ex4_plots.py:131-257).
    cells = []
    for bs in block_sizes:
        for i_period in i_periods:
            for qp in qp_values[bs]:
                ec = EncoderConfig(
                    block_size=bs, search_range=search_range, I_Period=i_period,
                    quantization_factor=qp, resolution=(width, height), backend=backend,
                )
                params = InputParameters(y_only_file, width, height, ec, num_frames)
                cells.append((bs, i_period, qp, params))

    batch_res = encode_videos_batched(
        [c[3] for c in cells],
        results_csv_path=os.path.join(output_dir, "results.csv"))
    results = []
    for (bs, i_period, qp, params), elapsed in zip(cells, batch_res.elapsed):
        metrics_csv = FileIOHelper(params, create_dirs=False).get_metrics_csv_file_name()
        idx, is_i, mae, psnr, fbytes, fbits = read_metrics_from_csv(metrics_csv)
        results.append({
            "block_size": bs, "qp": qp, "I_Period": i_period,
            "psnr_values": psnr, "bit_counts": [int(b * 8) for b in fbytes],
            "total_bit_count": int(fbits[-1]), "elapsed_time": elapsed,
        })

    out_csv = os.path.join(output_dir, "rd_experiment_results.csv")
    with open(out_csv, "w", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(["Block Size", "QP", "I_Period", "PSNR", "Bit Count",
                         "Total Bit Count", "Elapsed Time (s)"])
        for r in results:
            for p, b in zip(r["psnr_values"], r["bit_counts"]):
                writer.writerow([r["block_size"], r["qp"], r["I_Period"], p, b,
                                 r["total_bit_count"], r["elapsed_time"]])

    if plots:
        for bs in block_sizes:
            for i_period in i_periods:
                _plot_rd_curve(results, bs, i_period, output_dir)
        _plot_bitcount_vs_frame(results, block_sizes[0], qp_values[block_sizes[0]][1],
                                num_frames, output_dir)
    return results, out_csv


def _plot_rd_curve(results, block_size, i_period, output_dir):
    plt.figure(figsize=(10, 6))
    pts = [
        (r["total_bit_count"], float(np.mean(r["psnr_values"])), r["qp"])
        for r in results
        if r["block_size"] == block_size and r["I_Period"] == i_period
    ]
    pts.sort()
    if pts:
        bits, psnrs, qps = zip(*pts)
        plt.plot(bits, psnrs, "o-")
        for b, p, q in pts:
            plt.annotate(f"QP={q}", (b, p))
    plt.xlabel("Total Bit Count (bits)")
    plt.ylabel("PSNR (dB)")
    plt.title(f"R-D Curve for Block Size={block_size} and I_Period={i_period}")
    plt.grid(True)
    plt.savefig(os.path.join(output_dir, f"rd_curve_block_{block_size}_I_Period_{i_period}.png"))
    plt.close("all")


def _plot_bitcount_vs_frame(results, block_size, qp, num_frames, output_dir):
    plt.figure(figsize=(10, 6))
    for r in results:
        if r["block_size"] == block_size and r["qp"] == qp:
            plt.plot(range(1, len(r["bit_counts"]) + 1), r["bit_counts"],
                     label=f"I_Period={r['I_Period']}")
    plt.xlabel("Frame Index")
    plt.ylabel("Bit Count (bits)")
    plt.title(f"Bit Count vs Frame Index for Block Size={block_size} and QP={qp}")
    plt.legend()
    plt.grid(True)
    plt.savefig(os.path.join(output_dir, f"bitcount_vs_frame_block_{block_size}_QP_{qp}.png"))
    plt.close("all")
