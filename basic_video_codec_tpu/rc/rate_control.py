"""Row-granular rate control (3 modes).

Decision-for-decision parity with reference encoder/RateControl/RateControl.py:

* frame budget = targetBR / frame_rate (RateControl.py:5-6)
* RC1: constant per-row budget = remaining bits / rows left (RateControl.py:9-20)
* RC2/3 second pass: per-row budget proportional to the first pass's per-row
  bit share (RateControl.py:23-30)
* QP = lowest table QP whose expected bits * scaling <= budget, else the max
  table QP (RateControl.py:34-43).  NOTE the shipped tables have no QP 0 entry
  (the reference loader skips the first CSV column, lookup.py:107).  The
  ``scaling_factor`` parameter exists for API parity but is effectively always
  1: the reference stores the scene-change scaling on the first-pass frame
  (encoder.py:94) and never copies it to the second-pass frame that would use
  it (Frame.py:48).
"""


def bit_budget_per_frame(ec) -> float:
    return ec.targetBR / ec.frame_rate


def calculate_constant_row_bit_budget(remaining_bits, row_idx, ec) -> float:
    # Row count from the PADDED geometry: the encode loops iterate padded
    # block rows, so sizing rows-left from ec.resolution (as the reference
    # does, RateControl.py:12-16) would divide by zero on the last padded
    # row at non-block-multiple resolutions — a config the reference cannot
    # run at all (PARITY.md divergence 6).  Identical at block multiples.
    from ..utils.frame_utils import padded_dims

    frame_width, frame_height = ec.resolution
    padded_h = padded_dims(frame_width, frame_height, ec.block_size)[1]
    blocks_per_col = padded_h // ec.block_size
    rows_left = blocks_per_col - row_idx
    return remaining_bits / rows_left


def calculate_proportional_row_bit_budget(frame, row_idx, ec):
    prev_pass_frame = frame.prev_pass_frame
    if prev_pass_frame is None:
        raise ValueError(
            "proportional row budget needs a first-pass frame: "
            "prev_pass_frame is None (two-pass RC only)")
    bit_usage_proportion = prev_pass_frame.bits_per_row[row_idx] / sum(prev_pass_frame.bits_per_row)
    return bit_budget_per_frame(ec) * bit_usage_proportion, bit_usage_proportion


def find_rc_qp_for_row(bit_budget, qp_table, frame_type="C", scaling_factor=1):
    if frame_type not in ("I", "P", "C"):
        raise ValueError(
            f"find_rc_qp_for_row: unknown frame_type {frame_type!r} "
            "(expected an I/P/C table column)")
    for qp, bits in sorted(qp_table.items()):
        if bits[frame_type] * scaling_factor <= bit_budget:
            return qp
    return max(qp_table.keys())
