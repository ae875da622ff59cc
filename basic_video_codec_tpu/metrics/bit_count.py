"""Average entropy bits per block row, split by frame type.

Reference metrics/bit_count_per_block.py:13-82 — the offline data source for
the rate-control lookup tables: aggregates each run's frame bits over its
block rows, writes a per-frame ``*_avg_bits.csv`` next to each metrics file,
and returns the I/P/combined averages per input file.
"""

import csv
import os

from ..utils.logger import get_logger
from .frame_metrics import FrameMetrics
from .rd_curves import create_label

logger = get_logger()


def print_average_bit_count_per_block_row(metric_files, params):
    results = {}
    for file_path in metric_files:
        _, details = create_label(file_path)
        block_size = details["block_size"]
        blocks_per_col = params.height // block_size

        i_bits = p_bits = total_bits = 0
        i_rows = p_rows = total_rows = 0

        out_name = os.path.join(
            os.path.dirname(file_path),
            os.path.basename(file_path).replace(".csv", "_avg_bits.csv"),
        )
        with open(file_path, "rt") as f_in, open(out_name, "wt", newline="") as f_out:
            reader = csv.reader(f_in)
            writer = csv.writer(f_out)
            next(reader)
            for row in reader:
                m = FrameMetrics.from_csv_row(row)
                frame_bits = m.frame_bytes
                total_rows += blocks_per_col
                if m.is_i_frame:
                    i_bits += frame_bits
                    i_rows += blocks_per_col
                else:
                    p_bits += frame_bits
                    p_rows += blocks_per_col
                total_bits += frame_bits
                writer.writerow([m.idx, round(frame_bits / blocks_per_col, 2)])

        results[file_path] = {
            "Block Size": block_size,
            "Avg I-Frame Bits/Row": f"{i_bits / i_rows if i_rows else 0:.2f}",
            "Avg P-Frame Bits/Row": f"{p_bits / p_rows if p_rows else 0:.2f}",
            "Avg   Frame Bits/Row": f"{total_bits / total_rows if total_rows else 0:.2f}",
        }
        logger.info(results[file_path])
    return results
