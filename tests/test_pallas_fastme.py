"""Decision parity of the Pallas fastME (table + serial walk) vs the XLA
scan x while implementation, interpret mode on the CPU mesh.

The walk's exactness contract (ops/fastme.py docstring): candidate order,
the origin-substring termination quirk, the |mv| >= 16 bound, geometric
validity, the late-binding multiref comparison count, and n_valid warm-up
masking must all match — mvs, sads AND comps, bit for bit."""

import numpy as np
import pytest

import jax.numpy as jnp

from basic_video_codec_tpu.golden.interp import build_pre_interpolated_buffer
from basic_video_codec_tpu.ops.fastme import fast_search_frame
from basic_video_codec_tpu.ops.fastme_pallas import fast_search_frame_pallas
from basic_video_codec_tpu.tools import ygen


def _planes(rng, h, w, n_ref, frac, motion):
    if motion == "shift":
        base = ygen.moving_sequence(w, h, n_ref + 1, seed=3)
        refs = np.stack([base[i] for i in range(n_ref)])
        curr = base[n_ref]
    else:  # noise: exercises tie-breaks and early termination
        refs = rng.integers(0, 256, (n_ref, h, w)).astype(np.uint8)
        curr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    hps = (np.stack([build_pre_interpolated_buffer(r) for r in refs])
           if frac else np.zeros((n_ref, 2 * h, 2 * w), np.uint8))
    return curr, refs, hps


@pytest.mark.parametrize("frac", [False, True], ids=["int", "frac"])
@pytest.mark.parametrize("n_ref,n_valid", [(1, None), (3, None), (3, 2)],
                         ids=["ref1", "ref3", "ref3_warmup2"])
@pytest.mark.parametrize("motion", ["shift", "noise"])
def test_pallas_fastme_matches_xla(frac, n_ref, n_valid, motion):
    rng = np.random.default_rng(5)
    h, w, bs = 48, 64, 8
    curr, refs, hps = _planes(rng, h, w, n_ref, frac, motion)
    nv = None if n_valid is None else jnp.int32(n_valid)
    args = (jnp.asarray(curr), jnp.asarray(refs), jnp.asarray(hps), bs, frac)
    mvs_x, sads_x, comps_x = fast_search_frame(*args, n_valid=nv)
    mvs_p, sads_p, comps_p = fast_search_frame_pallas(*args, n_valid=nv,
                                                      interpret=True)
    assert np.array_equal(np.asarray(mvs_x), np.asarray(mvs_p))
    assert np.array_equal(np.asarray(sads_x), np.asarray(sads_p))
    assert np.array_equal(np.asarray(comps_x), np.asarray(comps_p))


def test_pallas_fastme_large_motion_bound():
    """Content whose best match sits far away: the walk must stop at the
    |mv| >= 16 bound exactly like the XLA version (and stay inside the
    +-RANGE table)."""
    h, w, bs = 64, 96, 16
    base = ygen.moving_sequence(w, h, 2, seed=9)
    # amplify motion: roll the reference far
    ref = np.roll(base[0], (18, -21), axis=(0, 1))
    curr = base[0]
    hps = np.zeros((1, 2 * h, 2 * w), np.uint8)
    args = (jnp.asarray(curr), jnp.asarray(ref)[None], jnp.asarray(hps), bs, False)
    mvs_x, sads_x, comps_x = fast_search_frame(*args)
    mvs_p, sads_p, comps_p = fast_search_frame_pallas(*args, interpret=True)
    assert np.array_equal(np.asarray(mvs_x), np.asarray(mvs_p))
    assert np.array_equal(np.asarray(sads_x), np.asarray(sads_p))
    assert np.array_equal(np.asarray(comps_x), np.asarray(comps_p))
