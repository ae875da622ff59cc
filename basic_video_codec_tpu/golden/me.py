"""Golden motion estimation (reference encoder/block_predictor.py semantics).

Decision-for-decision parity, implemented with vectorized scoring instead of
per-candidate Python where doing so provably cannot change any decision:

* **Full search** (block_predictor.py:61-91): every candidate in the
  ``(2r+1)^2 x nRef`` window is scored by MAE; out-of-range candidates are
  skipped (the reference raises/catches per candidate, we mask).  The winner
  is the *first-seen* minimum in (ref_idx, mv_y, mv_x) enumeration order,
  displaced only by a strictly lower MAE or an equal MAE with strictly
  smaller ``|mvx| + |mvy|`` — equivalent to a lexicographic argmin over
  ``(SAD, |mvx|+|mvy|, enumeration index)``.  MAE/SAD comparisons are exact
  (block sizes are powers of two, so ``SAD / bs^2`` is exact in float64).

* **Fast ME** (block_predictor.py:11-58): recursive refinement seeded at the
  MVP, candidates = {origin, MVP, MVP±1 cross}; recursion ends when a
  candidate whose name contains "origin" wins (i.e. the (0,0) candidate *or*
  the MVP itself — substring quirk at :50) or when ``|mv| >= 16``.
  For ``nRefFrames > 1``, the reference's candidate lambdas capture the loop
  variable (late binding, :23-28): every offset is effectively re-evaluated
  against the *latest* reference frame at each iteration, and the winning key
  always carries ref index 0.  Net observable effect, reproduced here: the
  winner is the first (ref_frame, offset) pair achieving the global minimum
  MAE, the reported motion vector always has ``ref_idx = 0``, and the
  comparison count is ``sum_i (i+1) * n_valid_offsets``.

* fractional ME doubles the search range and addresses a 2x half-pel buffer
  with stride 2 (block_predictor.py:65-66, 104-111).
"""

import numpy as np

from ..utils.frame_utils import mae


def is_out_of_range(mv_x, mv_y, origin, ref_frame, interpolated_ref_frame, ec) -> bool:
    """Candidate bounds check (reference block_predictor.py:116-143)."""
    if ec.fracMeEnabled:
        frame = interpolated_ref_frame
        h, w = frame.shape
        ox, oy = origin[0] * 2, origin[1] * 2
        bs2 = ec.block_size * 2
        return ox + mv_x < 0 or oy + mv_y < 0 or ox + mv_x + bs2 > w or oy + mv_y + bs2 > h
    frame = ref_frame
    h, w = frame.shape
    return (
        origin[0] + mv_x < 0
        or origin[1] + mv_y < 0
        or origin[0] + mv_x + ec.block_size > w
        or origin[1] + mv_y + ec.block_size > h
    )


def get_ref_block_at_mv(ref_frame, interpolated_ref_frame, origin, mv_x, mv_y, ec):
    """Extract the candidate block, integer or half-pel (block_predictor.py:93-114)."""
    bs = ec.block_size
    if is_out_of_range(mv_x, mv_y, origin, ref_frame, interpolated_ref_frame, ec):
        raise ValueError(f"Motion vector ({mv_x}, {mv_y}) is out of range.")
    if not ec.fracMeEnabled:
        return ref_frame[
            origin[1] + mv_y : origin[1] + mv_y + bs,
            origin[0] + mv_x : origin[0] + mv_x + bs,
        ]
    ix = origin[0] * 2 + mv_x
    iy = origin[1] * 2 + mv_y
    return interpolated_ref_frame[iy : iy + bs * 2 : 2, ix : ix + bs * 2 : 2]


def full_search(curr_block, origin, reference_frames, interpolated_reference_frames, ec):
    """Exhaustive search; returns (best_mv, min_mae, comparison_count).

    ``comparison_count`` mirrors the reference's reported value
    ``nRef * (2r+1)^2`` (block_predictor.py:91) — it counts the window size,
    not only in-range candidates.
    """
    search_range = ec.search_range * 2 if ec.fracMeEnabled else ec.search_range
    bs = ec.block_size
    if reference_frames[0].shape[0] < bs or reference_frames[0].shape[1] < bs:
        raise ValueError(
            f"reference frame {reference_frames[0].shape} is smaller than "
            f"one block (block_size={bs}); cannot run motion search"
        )

    curr = curr_block.astype(np.int64)
    best = None  # (mae, l1, ref_idx, mv_x, mv_y)
    for ref_idx in range(len(reference_frames)):
        rf = reference_frames[ref_idx]
        irf = interpolated_reference_frames[ref_idx]
        for mv_y in range(-search_range, search_range + 1):
            for mv_x in range(-search_range, search_range + 1):
                if is_out_of_range(mv_x, mv_y, origin, rf, irf, ec):
                    continue
                cand = get_ref_block_at_mv(rf, irf, origin, mv_x, mv_y, ec)
                err = np.abs(curr - cand).sum()
                l1 = abs(mv_x) + abs(mv_y)
                if best is None or err < best[0] or (err == best[0] and l1 < best[1]):
                    best = (err, l1, ref_idx, mv_x, mv_y)
    n = bs * bs
    comparisons = len(reference_frames) * (2 * search_range + 1) ** 2
    if best is None:
        return [0, 0, 0], float("inf"), comparisons
    return [best[3], best[4], best[2]], best[0] / n, comparisons


_FASTME_OFFSETS = (
    ("origin", lambda mvp: (0, 0)),
    ("pmv_origin", lambda mvp: (mvp[0], mvp[1])),
    ("pmv_top", lambda mvp: (mvp[0], mvp[1] - 1)),
    ("pmv_right", lambda mvp: (mvp[0] + 1, mvp[1])),
    ("pmv_bottom", lambda mvp: (mvp[0], mvp[1] + 1)),
    ("pmv_left", lambda mvp: (mvp[0] - 1, mvp[1])),
)


def fast_search(curr_block, origin, mvp, reference_frames, interpolated_reference_frames, ec,
                comparison_count=0):
    """MVP-seeded iterative refinement (reference block_predictor.py:11-58)."""
    n_ref = len(reference_frames)
    while True:
        offsets = [(name, fn(mvp)) for name, fn in _FASTME_OFFSETS]
        # Evaluate each offset against each reference frame.  Per the
        # late-binding quirk, iteration i re-evaluates all previously
        # registered offsets against frame i; only the first occurrence of a
        # value can win (strict <), so the winner is the first (frame, offset)
        # pair reaching the global minimum, and its reported ref index is 0.
        best = None  # (mae, frame_idx, offset_idx)
        for i in range(n_ref):
            rf = reference_frames[i]
            irf = interpolated_reference_frames[i]
            for k, (name, (ox, oy)) in enumerate(offsets):
                try:
                    cand = get_ref_block_at_mv(rf, irf, origin, ox, oy, ec)
                except ValueError:
                    continue
                err = mae(curr_block, cand)
                comparison_count += i + 1  # re-evaluated once per j <= i
                if best is None or err < best[0]:
                    best = (err, i, k)
        if best is None:
            # no valid candidate anywhere (cannot happen for in-frame blocks)
            return (0, 0, 0), float("inf"), comparison_count
        min_mae, _, k = best
        name, (ox, oy) = offsets[k]
        best_mv = (ox, oy, 0)  # ref idx always 0 (quirk)
        if "origin" in name:  # matches both "origin" and "pmv_origin" (quirk)
            return best_mv, min_mae, comparison_count
        if abs(best_mv[0]) >= 16 or abs(best_mv[1]) >= 16:
            return best_mv, min_mae, comparison_count
        mvp = best_mv
