"""Per-run metric plots and cross-run RD aggregation.

Capability parity with reference metrics/metrics.py:

* :func:`plot_metrics` — per-run PNGs from metrics.csv: MAE / PSNR /
  frame-bits vs frame index (I-frames marked), an RD scatter, and the
  polynomial-fit RD overview (reference metrics.py:15-28 writes the same
  five files into the run directory).
* :func:`calculate_rd_points_and_times` — aggregates (total bits, mean PSNR,
  elapsed time) per metrics file into RD series (metrics.py:241-252).
* :func:`plot_rd_curves` — overlays multiple RD series (metrics.py:255-271).
* :func:`tabulate_and_export_encoding_times` — text table + CSV of per-series
  timings (metrics.py:273-297, sans the PrettyTable dependency).
* :func:`plot_per_frame_psnr` — PSNR-vs-frame comparison across runs
  (metrics.py:300-318).

Output locations are parameters (the reference hardcodes
``../data/assign3_dels``) with the same defaults relative to a chosen
output directory.
"""

import csv
import os

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt
from matplotlib.ticker import MaxNLocator

from ..io.fileio import FileIOHelper
from ..utils.logger import get_logger
from .frame_metrics import FrameMetrics

logger = get_logger()


def read_metrics_from_csv(csv_file_name: str):
    """metrics.csv -> column lists (reference metrics.py:31-51)."""
    cols = {k: [] for k in ("idx", "i", "mae", "psnr", "bytes", "bits")}
    with open(csv_file_name, "r") as f:
        reader = csv.reader(f)
        next(reader)
        for row in reader:
            m = FrameMetrics.from_csv_row(row)
            cols["idx"].append(int(m.idx))
            cols["i"].append(int(m.is_i_frame))
            cols["mae"].append(float(m.avg_mae))
            cols["psnr"].append(float(m.psnr))
            cols["bytes"].append(float(m.frame_bytes))
            cols["bits"].append(float(m.file_bits))
    return (cols["idx"], cols["i"], cols["mae"], cols["psnr"], cols["bytes"], cols["bits"])


def _series_plot(out_path, x, is_i, series, series_name, title, xlabel="Frame Number"):
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(x, series, marker="o", linestyle="dotted", markersize=5,
            color="red", label=series_name, zorder=1, alpha=0.7)
    marks = [s if flag else None for flag, s in zip(is_i, series)]
    ax.scatter(x, marks, marker="x", s=64, color="black", label="I-Frame", zorder=2)
    ax.set_title(title)
    ax.set_xlabel(xlabel)
    if xlabel == "Frame Number":
        ax.xaxis.set_major_locator(MaxNLocator(integer=True))
    ax.set_ylabel(series_name)
    ax.legend(loc="upper right")
    ax.grid(True)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)


def plot_metrics(params):
    """Write the per-run plot set next to metrics.csv (metrics.py:15-28)."""
    file_io = FileIOHelper(params)
    idx, is_i, mae, psnr, fbytes, fbits = read_metrics_from_csv(
        file_io.get_metrics_csv_file_name()
    )

    def out(name):
        return file_io.get_file_name(name)

    _series_plot(out("avg_mae.png"), idx, is_i, mae, "Avg MAE", "MAE per Frame")
    _series_plot(out("psnr.png"), idx, is_i, psnr, "PSNR", "PSNR Frame")
    _series_plot(out("frame_bits.png"), idx, is_i, np.asarray(fbytes) * 8,
                 "frame bits", "Frame size")
    _series_plot(out("rd_curve.png"), fbits, is_i, psnr, "rd curve", "RD",
                 xlabel="Cumulative file bits")

    # polynomial-fit RD overview (metrics.py:77-111)
    fig, ax = plt.subplots(figsize=(10, 6))
    bits = np.asarray(fbits)
    ps = np.asarray(psnr)
    marks = [p if flag else None for flag, p in zip(is_i, ps)]
    ax.scatter(bits, marks, marker="x", s=64, color="black", label="I-Frame", zorder=2)
    ax.set_xlabel("Encoded frame size in Bytes")
    ax.set_ylabel("PSNR (dB)", color="r")
    ax.scatter(bits, ps, marker="o", color="r", label="PSNR")
    if len(bits) > 4:
        fit = np.poly1d(np.polyfit(bits, ps, 4))
        ax.plot(bits, fit(bits), linestyle="dotted", linewidth=1, color="r")
    ax.tick_params(axis="y", labelcolor="r")
    ax.grid(True)
    ec = params.encoder_config
    fig.suptitle(
        f"RD Curve with PSNR over File Bits\n"
        f"i [{ec.block_size}] r [{ec.search_range if ec.search_range > 0 else '-'}] "
        f"q [{ec.quantization_factor}] FracME [{ec.fracMeEnabled}] FastME [{ec.fastME}]"
    )
    fig.tight_layout()
    fig.savefig(out("rdv2.png"))
    plt.close(fig)
    logger.info(f"plots written to {file_io.get_file_name('')}")


class RDPointSeries:
    """Named (total_bits, avg_psnr) series (reference metrics.py:225-234)."""

    def __init__(self, series_name):
        self.series_name = series_name
        self.rd_points = []

    def add_point(self, total_bits, avg_psnr):
        self.rd_points.append((total_bits, avg_psnr))

    def get_points(self):
        return self.rd_points


def calculate_rd_points_and_times(files, series_name):
    """Total file bits + mean PSNR + elapsed time per metrics file
    (reference metrics.py:241-252)."""
    rd_points = RDPointSeries(series_name)
    encoding_times = []
    for path in files:
        _, _, _, psnr, _, fbits = read_metrics_from_csv(path)
        rd_points.add_point(sum(fbits), float(np.mean(psnr)))
        with open(path) as f:
            last = list(csv.reader(f))[-1]
        encoding_times.append(float(last[-1]))
    return rd_points, encoding_times


def plot_rd_curves(series_collection, out_path):
    """Overlay multiple RD series (reference metrics.py:255-271)."""
    plt.figure(figsize=(8, 5))
    for series in series_collection:
        total_bits, avg_psnr = zip(*series.get_points())
        plt.plot(total_bits, avg_psnr, marker="x", label=series.series_name)
    plt.title("Rate-Distortion Curves")
    plt.xlabel("Total Bitstream Size (bits)")
    plt.ylabel("Average PSNR (dB)")
    plt.legend()
    plt.grid(True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    plt.savefig(out_path)
    plt.close("all")


def tabulate_and_export_encoding_times(series_collection, encoding_times_collection,
                                       out_csv_path):
    """Per-series timing table -> stdout text + CSV (metrics.py:273-297)."""
    header = ["Series", "Bits (bits)", "PSNR (dB)", "Encoding Time (s)"]
    rows = [header]
    for series, times in zip(series_collection, encoding_times_collection):
        for (bits, psnr), t in zip(series.get_points(), times):
            rows.append([series.series_name, bits, f"{psnr:.2f}", f"{t:.2f}"])
    widths = [max(len(str(r[c])) for r in rows) for c in range(len(header))]
    for r in rows:
        print(" | ".join(str(v).ljust(w) for v, w in zip(r, widths)))
    os.makedirs(os.path.dirname(out_csv_path) or ".", exist_ok=True)
    with open(out_csv_path, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    return rows


def plot_per_frame_psnr(metric_files, out_path, title="Per-Frame PSNR"):
    """PSNR-vs-frame comparison across runs (reference metrics.py:300-318)."""
    fig, ax = plt.subplots(figsize=(8, 5))
    for i, path in enumerate(metric_files):
        idx, _, _, psnr, _, _ = read_metrics_from_csv(path)
        ax.plot(idx, psnr, marker="o", label=f"RCflag {i + 1}")
    ax.xaxis.set_major_locator(MaxNLocator(integer=True))
    ax.set_title(title)
    ax.set_xlabel("Frame Index")
    ax.set_ylabel("PSNR (dB)")
    ax.legend()
    ax.grid(True)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    fig.savefig(out_path)
    plt.close(fig)
