"""Run-length coding of zigzagged coefficients.

Symbol grammar (bit-stream parity with reference entropy_encoder.py:65-112):

* ``+n``  — a run of ``n`` zeros (only when non-zero terms still follow),
* ``-n``  — ``n`` literal non-zero values follow,
* ``0``   — the rest of the block is all zeros (terminator),
* a block that *ends* with non-zero values has no terminator.

``rle_encode``/``rle_decode`` are the scalar (golden) forms.
``rle_encode_blocks`` is the production path: one vectorized pass emits the
entire symbol stream (with per-block EOB markers) for all blocks of a frame
row — no per-coefficient Python.
"""

import numpy as np

EOB_MARKER = 8190  # reference encoder/Frame.py:23


def rle_encode(coeffs) -> list:
    """Scalar RLE of one block's zigzag scan (reference entropy_encoder.py:65-88)."""
    encoded = []
    i = 0
    n = len(coeffs)
    while i < n:
        if coeffs[i] == 0:
            zero_count = 0
            while i < n and coeffs[i] == 0:
                zero_count += 1
                i += 1
            encoded.append(zero_count if i < n else 0)
        else:
            start = i
            while i < n and coeffs[i] != 0:
                i += 1
            encoded.append(-(i - start))
            encoded.extend(int(c) for c in coeffs[start:i])
    return encoded


def rle_decode(encoded) -> list:
    """Scalar inverse (reference entropy_encoder.py:91-112)."""
    decoded = []
    i = 0
    while i < len(encoded):
        count = encoded[i]
        if count == 0:
            break
        if count > 0:
            decoded.extend([0] * count)
        else:
            count = -count
            i += 1
            decoded.extend(encoded[i : i + count])
            i += count - 1
        i += 1
    return decoded


def rle_encode_blocks(zigzagged: np.ndarray, eob_marker: int = EOB_MARKER) -> np.ndarray:
    """Vectorized RLE + EOB over a batch of blocks.

    Parameters
    ----------
    zigzagged : int array ``[n_blocks, L]``
        Each row is one block's zigzag scan (raster block order).

    Returns
    -------
    int64 array — the concatenated symbol stream
    ``block0_rle..., EOB, block1_rle..., EOB, ...`` identical to running the
    scalar encoder per block.
    """
    z = np.ascontiguousarray(zigzagged, dtype=np.int64)
    n_blocks, L = z.shape
    if n_blocks == 0:
        return np.zeros(0, dtype=np.int64)
    x = z.ravel()
    P = x.shape[0]
    pos = np.arange(P, dtype=np.int64)
    nzc = x != 0

    # Run starts: block boundary or zero/non-zero class change.
    start = np.empty(P, dtype=bool)
    start[0] = True
    start[1:] = nzc[1:] != nzc[:-1]
    start[::L] = True

    run_start = pos[start]                       # [R]
    run_len = np.diff(np.append(run_start, P))   # [R]
    run_class = nzc[run_start]                   # True = non-zero run
    run_block = run_start // L                   # [R]
    run_ends_block = (run_start + run_len) % L == 0

    # Output length of each run's symbols; +1 EOB per block.
    run_out_len = np.where(run_class, 1 + run_len, 1)
    per_block = np.bincount(run_block, weights=run_out_len, minlength=n_blocks).astype(np.int64)
    per_block += 1  # EOB
    block_offset = np.concatenate(([0], np.cumsum(per_block)))  # [n_blocks+1]
    total = int(block_offset[-1])

    # Global output offset of each run = runs before it + EOBs of earlier blocks.
    run_excl = np.concatenate(([0], np.cumsum(run_out_len)[:-1]))
    run_global = run_excl + run_block

    out = np.zeros(total, dtype=np.int64)
    # Run headers.
    header = np.where(
        run_class,
        -run_len,
        np.where(run_ends_block, 0, run_len),
    )
    out[run_global] = header
    # Literal values of non-zero runs.
    nz_pos = pos[nzc]
    run_id = np.cumsum(start) - 1
    r = run_id[nz_pos]
    out[run_global[r] + 1 + (nz_pos - run_start[r])] = x[nz_pos]
    # EOB terminators.
    out[block_offset[1:] - 1] = eob_marker
    return out
