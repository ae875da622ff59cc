"""Pallas full-search ME kernel: interpret-mode parity vs the XLA scan
(ops/me.py) — identical MVs (tie-breaks included), SADs and predictions —
plus the measured selection gate."""

import numpy as np
import pytest

from basic_video_codec_tpu.golden.interp import build_pre_interpolated_buffer
from basic_video_codec_tpu.ops.me import full_search
from basic_video_codec_tpu.ops.pallas_me import (
    PALLAS_MAX_CANDIDATES,
    full_search_pallas,
    use_pallas,
)
from basic_video_codec_tpu.tools import ygen


def _parity_case(W, H, bs, r, frac, n_ref, seed):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    base = ygen.textured_frame(W, H, seed=seed)
    refs_np = [base]
    for k in range(1, n_ref):
        refs_np.append(np.roll(base, (k, -k), (0, 1)))
    refs_np = np.stack(refs_np)
    curr = jnp.asarray(np.roll(base, (2, 1), (0, 1)))
    refs = jnp.asarray(refs_np)
    hps = jnp.asarray(np.stack([build_pre_interpolated_buffer(x) for x in refs_np]))
    a = [np.asarray(x) for x in full_search(curr, refs, hps, bs, r, frac)]
    b = [np.asarray(x) for x in
         full_search_pallas(curr, refs, hps, bs, r, frac, interpret=True)]
    for x, y, name in zip(a, b, ("mvs", "sads", "preds")):
        assert np.array_equal(x, y), name


@pytest.mark.parametrize("frac", [False, True])
def test_interpret_parity_single_ref(frac):
    _parity_case(48, 32, 8, 2, frac, 1, seed=5)


def test_interpret_parity_multi_ref():
    _parity_case(48, 32, 8, 1, False, 3, seed=6)


def test_interpret_parity_tie_breaks():
    """Flat content ties every SAD: the winner must follow the reference
    tie-break (lower |mvx|+|mvy|, then enumeration order) in both kernels."""
    import jax.numpy as jnp

    flat = np.full((32, 32), 77, np.uint8)
    curr = jnp.asarray(flat)
    refs = jnp.asarray(flat[None])
    hps = jnp.asarray(build_pre_interpolated_buffer(flat)[None])
    a = [np.asarray(x) for x in full_search(curr, refs, hps, 8, 2, False)]
    b = [np.asarray(x) for x in
         full_search_pallas(curr, refs, hps, 8, 2, False, interpret=True)]
    assert np.array_equal(a[0], b[0])  # all-zero MVs via the L1 tie-break
    assert (a[0][..., :2] == 0).all()


def test_selection_gate():
    """The gate admits only shapes measured faster AND within the VMEM
    unroll budget; it is always off outside TPU backends (this test runs on
    the CPU conftest, so both calls must return False here)."""
    assert not use_pallas(288, 352, 8, 2, 1, False)  # CPU backend -> off
    # candidate-count arithmetic (backend-independent part)
    sr_big = 4
    assert 1 * (2 * sr_big + 1) ** 2 > PALLAS_MAX_CANDIDATES
