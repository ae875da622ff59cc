"""The encode -> plot -> decode triad every reference driver wires up
(assign1/ex3.py:7-10, ex4.py, assign2/FastME.py:8-11, assign3/Deliverable.py:43-45)."""

from ..decoder import decode_video
from ..encoder import encode_video
from ..io.fileio import FileIOHelper
from ..metrics.plots import plot_metrics


def encode_plot_decode(params, results_csv_path="results.csv", plots=True, decode=True):
    """Run one full configuration; returns its metrics.csv path."""
    encode_video(params, results_csv_path=results_csv_path)
    if plots:
        plot_metrics(params)
    if decode:
        decode_video(params)
    return FileIOHelper(params, create_dirs=False).get_metrics_csv_file_name()
