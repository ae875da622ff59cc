"""Rate-control calibration tables.

The reference ships eight pre-computed CSVs mapping QP -> average entropy bits
per block-row, keyed by ``{W}_{H}_{bs}_{I|P}`` (encoder/RateControl/lookups/).
Those calibration *numbers* are embedded below verbatim (they are measurement
data the RC decisions depend on — identical values are required for identical
QP choices).

Loader parity notes (reference encoder/RateControl/lookup.py:95-131):

* ``get_combined_lookup_table`` skips the first CSV column, so **QP 0 is
  absent** from the loaded table.  RC can therefore never choose QP 0, and
  the overage computation raises for QP-0 configs exactly like the reference.
* each entry gets a combined ``"C"`` value ``(I + P) // 2``.

``generate_rc_lookup`` rebuilds a table from metrics CSVs (the offline
calibration flow, reference lookup.py:19-76 / assign3/Ex1.py).
"""

import csv
import os

# (width, height, block_size) -> {"I": [bits per QP 0..maxqp], "P": [...]}
# Values from reference encoder/RateControl/lookups/*.csv (calibration data).
EMBEDDED_LOOKUPS = {
    (352, 288, 16): {
        "I": [26055, 19904, 14547, 10201, 6820, 4288, 2686, 1670, 1088, 821, 726, 707],
        "P": [22591, 16782, 11762, 7950, 5056, 2856, 1638, 1078, 871, 816, 791, 740],
    },
    (352, 288, 8): {
        "I": [14165, 10976, 8230, 5969, 4280, 3099, 2320, 1825, 1529, 1414, 1398],
        "P": [12049, 9014, 6580, 4694, 3264, 2308, 1824, 1628, 1545, 1489, 1428],
    },
    (176, 144, 16): {
        "I": [14344, 11091, 8385, 6248, 4489, 3051, 1900, 1092, 659, 452, 373, 362],
        "P": [11102, 8173, 5836, 4118, 2810, 1782, 1084, 628, 444, 408, 397, 388],
    },
    (176, 144, 8): {
        "I": [7708, 6079, 4694, 3587, 2688, 1992, 1439, 1057, 820, 726, 706],
        "P": [5907, 4452, 3297, 2427, 1784, 1315, 1000, 837, 782, 758, 725],
    },
}

_LOOKUP_DIR = os.path.join(os.path.dirname(__file__), "lookups")


def _ensure_lookup_csvs():
    """Materialize the embedded tables as CSVs (same 2-row layout as the
    reference: row 0 = QP values, row 1 = bits per block-row)."""
    os.makedirs(_LOOKUP_DIR, exist_ok=True)
    for (w, h, bs), tables in EMBEDDED_LOOKUPS.items():
        for ftype, bits in tables.items():
            path = os.path.join(_LOOKUP_DIR, f"{w}_{h}_{bs}_{ftype}.csv")
            if not os.path.exists(path):
                with open(path, "wt", newline="") as f:
                    writer = csv.writer(f)
                    writer.writerow(list(range(len(bits))))
                    writer.writerow(bits)


def rc_lookup_file_path(ec, i_period_str=None) -> str:
    """Table path for a config (reference lookup.py:12-18)."""
    _ensure_lookup_csvs()
    res_str = f"{ec.resolution[0]}_{ec.resolution[1]}"
    if not i_period_str:
        i_period_str = "I" if ec.I_Period == 1 else "P"
    return os.path.join(_LOOKUP_DIR, f"{res_str}_{ec.block_size}_{i_period_str}.csv")


def _read_two_row_csv(path):
    with open(path, "rt") as f:
        rows = list(csv.reader(f))
    return rows[0], rows[1]


def get_combined_lookup_table(file_path_i: str, file_path_p: str) -> dict:
    """Load I+P tables into ``{qp: {"I": bits, "P": bits, "C": avg}}``.

    Preserves the reference loader's first-column skip (lookup.py:107,118):
    QP 0 never appears in the returned table.
    """
    if not os.path.exists(file_path_i):
        raise FileNotFoundError(f"I-frame RC lookup file not found @ {file_path_i}")
    if not os.path.exists(file_path_p):
        raise FileNotFoundError(f"P-frame RC lookup file not found @ {file_path_p}")

    lookup_table = {}
    for path, key in ((file_path_i, "I"), (file_path_p, "P")):
        qps, values = _read_two_row_csv(path)
        for qp, value in zip(qps[1:], values[1:]):  # skip first column (quirk)
            qp = int(qp)
            lookup_table.setdefault(qp, {})[key] = int(value)
    for qp in lookup_table:
        i_value = lookup_table[qp].get("I", 0)
        p_value = lookup_table[qp].get("P", 0)
        lookup_table[qp]["C"] = (i_value + p_value) // 2
    return lookup_table


def load_lookup_table(ec) -> dict:
    """Convenience: combined table for a config's resolution/block size."""
    return get_combined_lookup_table(
        rc_lookup_file_path(ec, "I"), rc_lookup_file_path(ec, "P")
    )


def generate_rc_lookup(metric_rows_per_qp: dict, params, output_path: str | None = None) -> str:
    """Offline calibration: aggregate avg bits per block-row per QP.

    ``metric_rows_per_qp`` maps qp -> list of FrameMetrics.  Mirrors the
    aggregation of reference lookup.py:19-76 (I rows feed the ``*_I.csv``
    table when I_Period == 1, P rows feed ``*_P.csv`` otherwise).
    """
    ec = params.encoder_config
    i_period_str = "I" if ec.I_Period == 1 else "P"
    output_path = output_path or rc_lookup_file_path(ec)
    blocks_per_col = params.height // ec.block_size

    qps, avgs = [], []
    for qp in sorted(metric_rows_per_qp):
        bits = rows = 0
        for m in metric_rows_per_qp[qp]:
            if (i_period_str == "I") == bool(m.is_i_frame):
                bits += m.frame_bytes * 8
                rows += blocks_per_col
        qps.append(qp)
        avgs.append(round(bits / rows) if rows else 0)

    with open(output_path, "wt", newline="") as f:
        writer = csv.writer(f)
        writer.writerow(qps)
        writer.writerow(avgs)
    return output_path
