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
    import shutil

    os.makedirs(out_dir, exist_ok=True)
    # The artifact identifier scheme (io/fileio.py, parity with reference
    # file_io.py:20) does NOT include fastME, so the 'base' and 'fastME'
    # series would write the SAME config directory and the later encode
    # would overwrite the earlier one's metrics (the reference's own
    # driver has this collision latent — its encode calls are commented
    # out, assign2/Deliverable.py:48).  Each series therefore encodes
    # against its own hardlinked copy of the input, giving every series a
    # private artifact tree without touching the per-run naming parity.
    def series_input(name):
        slug = name.replace(" ", "_")
        d = os.path.join(out_dir, "runs", slug)
        os.makedirs(d, exist_ok=True)
        dst = os.path.join(d, os.path.basename(y_only_file))
        if not os.path.exists(dst):
            try:
                os.link(y_only_file, dst)
            except OSError:
                shutil.copyfile(y_only_file, dst)
        return dst

    # Build every (series, QP) cell up front and batch-encode: each series'
    # QP sweep shares one vmapped device program (models/batch.py) — the
    # nRefFrames=4 series ride the rolling-stack multiref chunk program,
    # so the whole grid batches.
    cells = []
    for name, overrides in SERIES:
        y_series = series_input(name)
        for qp in qps:
            kwargs = dict(block_size=16, search_range=4, I_Period=8,
                          quantization_factor=qp, resolution=(width, height),
                          backend=backend)
            kwargs.update(overrides)
            ec = EncoderConfig(**kwargs)
            params = InputParameters(y_series, width, height, ec, num_frames)
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
