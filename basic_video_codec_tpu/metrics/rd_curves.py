"""Cross-run RD comparison plots + config-directory label parsing.

Reference metrics/plot_rd_curves.py.  NOTE the reference's ``create_label``
expects the *older* 5-field directory naming ``bs_sr_qp_IPeriod_nRef`` and
fixed path depth (plot_rd_curves.py:11-35); this version parses the config
component wherever it sits in the path and accepts both the 5-field and the
current 7-field ``bs_sr[.0]_qp_IPeriod_nRef_RCflag_targetBR`` scheme
(file_io.py:20).
"""

import csv
import os

import matplotlib

matplotlib.use("Agg")
import numpy as np
from matplotlib import pyplot as plt

from .frame_metrics import FrameMetrics


def create_label(file_path):
    """Parse the run-config directory back into parameters.

    Returns ``(label, details)`` with the reference's keys
    (plot_rd_curves.py:38-52) plus RCflag/targetBR when present.
    """
    parts = [p for p in file_path.replace("\\", "/").split("/") if p]
    config, seq_name = None, None
    for i, part in enumerate(parts):
        fields = part.split("_")
        if len(fields) in (5, 7) and not part.endswith(".csv"):
            try:
                int(fields[0]), float(fields[1]), int(fields[2])
            except ValueError:
                continue
            config = fields
            seq_name = parts[i - 1] if i > 0 else ""
            break
    if config is None:
        raise ValueError("File path does not match the expected format.")

    block_size = int(config[0])
    search_range = float(config[1])
    qp = int(config[2])
    I_Period = int(config[3])
    nRefFrames = int(config[4])
    details = {
        "file_name": seq_name,
        "block_size": block_size,
        "search_range": search_range,
        "qp": qp,
        "nRefFrames": nRefFrames,
        "I_Period": I_Period,
        "fracMeEnabled": "." in config[1],
        "fastMeEnabled": search_range < 0,
    }
    if len(config) == 7:
        details["RCflag"] = int(config[5])
        details["targetBR"] = int(config[6])
    return f"qp={qp}", details


def plot_RD_curves_metrics(base_metric_files, metric_files, seq_name, out_dir):
    """Overlay base-vs-feature RD curves with quadratic fits
    (reference plot_rd_curves.py:55-139)."""
    plt.close("all")
    fig, ax = plt.subplots(figsize=(12, 8))
    palette = plt.cm.tab10.colors
    color_map = {}

    def get_color(label):
        if label not in color_map:
            color_map[label] = palette[len(color_map) % len(palette)]
        return color_map[label]

    def process(file_list, label_prefix, is_base=False):
        for path in file_list:
            file_bits, psnr_values = [], []
            encoding_time = 0.0
            with open(path) as f:
                reader = csv.reader(f)
                next(reader)
                for row in reader:
                    m = FrameMetrics.from_csv_row(row)
                    file_bits.append(float(m.file_bits))
                    psnr_values.append(float(m.psnr))
                    encoding_time = m.elapsed_time
            bits = np.asarray(file_bits)
            ps = np.asarray(psnr_values)
            order = np.argsort(bits)
            bits, ps = bits[order], ps[order]
            label = f"{label_prefix}  {create_label(path)[0]}  t={encoding_time:.2f}s"
            color = get_color(label_prefix)
            ax.scatter(bits, ps, marker="." if is_base else "x",
                       label=label, color=color, alpha=0.8)
            if len(bits) > 2:
                fit = np.poly1d(np.polyfit(bits, ps, 2))
                ax.plot(bits, fit(bits), linestyle="dotted",
                        linewidth=0.5 if is_base else 0.7, color=color, alpha=0.6)

    process(base_metric_files, "base", is_base=True)
    process(metric_files, seq_name)

    ax.set_xlabel("Bits in File")
    ax.set_ylabel("PSNR (dB)")
    ax.set_title(f"PSNR vs File_Bits | base vs [{seq_name}]")
    ax.legend(loc="lower right")
    ax.grid(True)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{seq_name}.png")
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close(fig)
    return out_path
