"""Ad-hoc metric-column comparison plot (reference AutoPlotMaker.py:1-37
capability): overlay one column of several metrics.csv files."""

import csv

import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt


def plot_metric_column(file_paths, out_path, column=2, title="Metric comparison",
                       labels=None):
    """Overlay ``column`` (default avg_MAE=2; PSNR=4) of each metrics.csv."""
    plt.figure(figsize=(10, 6))
    for i, path in enumerate(file_paths):
        with open(path) as f:
            reader = csv.reader(f)
            next(reader)
            ys = [float(row[column]) for row in reader]
        label = labels[i] if labels else f"File {i + 1}"
        plt.plot(ys, label=label)
    plt.xlabel("Index")
    plt.ylabel("Value")
    plt.title(title)
    plt.legend()
    plt.savefig(out_path)
    plt.close("all")
    return out_path
