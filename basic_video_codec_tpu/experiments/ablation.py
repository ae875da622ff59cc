"""Feature-ablation RD study (reference assign2/Deliverable.py:19-58).

Five configurations at block 16, r=4, I_Period 8 over QPs {1, 4, 7, 10}:
base, +nRefFrames=4, +fracME, +fastME, and all features — each overlaid
against the base RD curve with timing labels.
"""

import copy
import os

from ..config import EncoderConfig, InputParameters
from ..io.fileio import FileIOHelper
from ..metrics.rd_curves import plot_RD_curves_metrics
from .pipeline_run import encode_plot_decode

SERIES = [
    ("base", {}),
    ("4 nRefFrames", {"nRefFrames": 4}),
    ("fracME", {"fracMeEnabled": True}),
    ("fastME", {"fastME": True}),
    ("All enabled", {"nRefFrames": 4, "fracMeEnabled": True, "fastME": True}),
]


def run_ablation(y_only_file, width=352, height=288, qps=(1, 4, 7, 10),
                 num_frames=10, out_dir="results/ablation", backend="auto",
                 plots=True):
    os.makedirs(out_dir, exist_ok=True)
    all_metric_files = {}
    for name, overrides in SERIES:
        metric_files = []
        for qp in qps:
            kwargs = dict(block_size=16, search_range=4, I_Period=8,
                          quantization_factor=qp, resolution=(width, height),
                          backend=backend)
            kwargs.update(overrides)
            ec = EncoderConfig(**kwargs)
            params = InputParameters(y_only_file, width, height, ec, num_frames)
            metric_files.append(
                encode_plot_decode(params, results_csv_path=None, plots=False, decode=False)
            )
        all_metric_files[name] = metric_files

    if plots:
        base_files = all_metric_files["base"]
        for name, files in all_metric_files.items():
            if name == "base":
                continue
            plot_RD_curves_metrics(base_files, files, name, out_dir)
    return all_metric_files
