"""Feature-ablation RD study (reference assign2/Deliverable.py:19-58).

Five configurations at block 16, r=4, I_Period 8 over QPs {1, 4, 7, 10}:
base, +nRefFrames=4, +fracME, +fastME, and all features — each overlaid
against the base RD curve with timing labels.
"""

import os

from ..config import EncoderConfig, InputParameters
from ..io.fileio import FileIOHelper
from ..metrics.rd_curves import plot_RD_curves_metrics
from ..models.batch import encode_videos_batched

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
    # Build every (series, QP) cell up front and batch-encode: each series'
    # QP sweep shares one vmapped device program (models/batch.py) — the
    # nRefFrames=4 series ride the rolling-stack multiref chunk program,
    # so the whole grid batches.
    cells = []
    for name, overrides in SERIES:
        for qp in qps:
            kwargs = dict(block_size=16, search_range=4, I_Period=8,
                          quantization_factor=qp, resolution=(width, height),
                          backend=backend)
            kwargs.update(overrides)
            ec = EncoderConfig(**kwargs)
            params = InputParameters(y_only_file, width, height, ec, num_frames)
            cells.append((name, params))
    encode_videos_batched([c[1] for c in cells], results_csv_path=None)
    all_metric_files = {}
    for name, params in cells:
        all_metric_files.setdefault(name, []).append(
            FileIOHelper(params, create_dirs=False).get_metrics_csv_file_name())

    if plots:
        base_files = all_metric_files["base"]
        for name, files in all_metric_files.items():
            if name == "base":
                continue
            plot_RD_curves_metrics(base_files, files, name, out_dir)
    return all_metric_files
