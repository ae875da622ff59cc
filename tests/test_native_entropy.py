"""Native (C) entropy codec vs the Python/NumPy reference implementations."""

import numpy as np
import pytest

from basic_video_codec_tpu.entropy import (
    EOB_MARKER,
    rle_encode_blocks,
    symbols_to_bits,
)
from basic_video_codec_tpu.entropy import native


needs_native = pytest.mark.skipif(not native.available(), reason="no native codec")


@needs_native
class TestNativeCodec:
    def test_encode_matches_numpy(self):
        rng = np.random.default_rng(0)
        syms = rng.integers(-5000, 5001, size=2000)
        syms[::7] = EOB_MARKER
        data, nbits = native.encode_symbols_bytes(syms)
        bits = symbols_to_bits(syms)
        assert nbits == bits.shape[0]
        assert data == np.packbits(bits).tobytes()

    def test_decode_round_trip(self):
        rng = np.random.default_rng(1)
        syms = rng.integers(-300, 301, size=1500)
        data, _ = native.encode_symbols_bytes(syms)
        out = native.decode_symbols_np(data, syms.size)
        assert np.array_equal(out, syms)

    def test_decode_stops_at_padding(self):
        syms = np.array([7, -7, 0, 8190], dtype=np.int64)
        data, _ = native.encode_symbols_bytes(syms)
        out = native.decode_symbols_np(data, 100)
        assert out.tolist() == syms.tolist()

    def test_decode_dct_scans_round_trip(self):
        rng = np.random.default_rng(2)
        L, n_blocks = 64, 50
        scans = (rng.integers(-40, 41, size=(n_blocks, L))
                 * (rng.random((n_blocks, L)) < 0.3)).astype(np.int64)
        symbol_stream = rle_encode_blocks(scans, EOB_MARKER)
        data, _ = native.encode_symbols_bytes(symbol_stream)
        out = native.decode_dct_scans(data, n_blocks, L, EOB_MARKER)
        assert np.array_equal(out, scans)

    def test_all_zero_and_dense_blocks(self):
        L, n = 64, 4
        scans = np.zeros((n, L), dtype=np.int64)
        scans[1] = 1  # fully dense
        scans[2, :3] = [5, 0, -5]
        stream = rle_encode_blocks(scans, EOB_MARKER)
        data, _ = native.encode_symbols_bytes(stream)
        out = native.decode_dct_scans(data, n, L, EOB_MARKER)
        assert np.array_equal(out, scans)


def test_fallback_paths_match_native_or_numpy():
    """The fallback implementations agree with whichever path is active."""
    rng = np.random.default_rng(3)
    syms = rng.integers(-100, 101, size=400)
    data, nbits = native.encode_symbols_bytes(syms)
    bits = symbols_to_bits(syms)
    assert nbits == bits.shape[0]
    assert np.array_equal(native.decode_symbols_np(data, syms.size), syms)


def test_native_rebuild_helpers_match_numpy(monkeypatch):
    """The new native rebuild helpers (bvc_unpack_qdct / joint states+apply /
    pred_inter / intra_rebuild / wrap_diff) must agree bit-for-bit with the
    NumPy fallbacks they shadow."""
    import basic_video_codec_tpu.ops.pack as PK
    from basic_video_codec_tpu.entropy.zigzag import zigzag_indices
    from basic_video_codec_tpu.models.pipeline import _wrap_diff_u8

    if not native.available():
        import pytest

        pytest.skip("native library unavailable")

    rng = np.random.default_rng(9)
    h, w, bs = 48, 64, 8
    nbr, nbc = h // bs, w // bs

    def both(fn, *a, **kw):
        out_native = fn(*a, **kw)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        out_np = fn(*a, **kw)
        monkeypatch.undo()
        assert np.array_equal(np.asarray(out_native), np.asarray(out_np)), fn
        return out_native

    # unpack_qdct
    q = np.zeros((h, w), np.int16)
    m = rng.random((h, w)) < 0.2
    q[m] = rng.integers(-30, 31, m.sum())
    zz = zigzag_indices(bs)
    scans = q.reshape(nbr, bs, nbc, bs).swapaxes(1, 2).reshape(-1, bs * bs)[:, zz]
    nz = scans != 0
    lens = np.where(nz.any(1), bs * bs - np.argmax(nz[:, ::-1], 1), 0)
    vals = np.concatenate([scans[i, : lens[i]] for i in range(len(lens))]
                          + [np.zeros(4, np.int16)]).astype(np.int16)
    out = both(PK.unpack_qdct, vals, lens.astype(np.int16), h, w, bs, zz)
    assert np.array_equal(out, q)

    # joint states + bitmap/kind decode + apply
    jc = rng.integers(0, 256, 3 * h * w // 8).astype(np.uint8)
    states = both(PK.host_joint_states, jc)
    jb = rng.integers(0, 256, h * w // 8).astype(np.uint8)
    jk = rng.integers(0, 256, 3 * PK.jk_cap(h, w, False) // 8).astype(np.uint8)
    both(PK.host_joint_decode, jb, jk, h * w)
    st = np.zeros(h * w, np.uint8)
    st[: 40] = rng.integers(0, 8, 40)  # sparse escapes so the list suffices
    esc = rng.integers(0, 256, h * w).astype(np.uint8)
    base = rng.integers(0, 256, (h, w)).astype(np.int32)
    both(PK.apply_joint, st, esc, base, PK.J_RP, PK.J_RM,
         (PK.J_RESC, PK.J_BESC))
    both(PK.apply_joint, st, esc, base, PK.J_AP, PK.J_AM,
         (PK.J_AESC, PK.J_BESC))

    # pred_inter (int + frac)
    refs = rng.integers(0, 256, (2, h, w)).astype(np.uint8)
    hps = rng.integers(0, 256, (2, 2 * h, 2 * w)).astype(np.uint8)
    mvs = np.zeros((nbr, nbc, 3), np.int32)
    mvs[..., 0] = rng.integers(-2, 3, (nbr, nbc))
    mvs[..., 1] = rng.integers(-2, 3, (nbr, nbc))
    mvs[..., 2] = rng.integers(0, 2, (nbr, nbc))
    for i in range(nbr):
        for j in range(nbc):
            mvs[i, j, 0] = np.clip(mvs[i, j, 0], -j * bs, w - (j + 1) * bs)
            mvs[i, j, 1] = np.clip(mvs[i, j, 1], -i * bs, h - (i + 1) * bs)
    both(PK.host_pred_inter, refs, mvs, bs, False)
    mvs2 = mvs.copy()
    mvs2[..., :2] *= 2
    both(PK.host_pred_inter, refs, mvs2, bs, True, hps)

    # intra rebuild (device encode -> codes -> host chain)
    import jax.numpy as jnp

    from basic_video_codec_tpu.ops.intra import intra_encode_frame

    curr = rng.integers(0, 256, (h, w)).astype(np.uint8)
    row_qps = np.full(nbr, 3, np.int32)
    recon, _, _, qdct, smalls = intra_encode_frame(
        jnp.asarray(curr), jnp.asarray(row_qps), jnp.float32(0),
        jnp.zeros(1, jnp.int32), jnp.zeros(1, jnp.float32), jnp.int32(3),
        bs, False)
    modes = np.asarray(smalls)[: nbr * nbc].reshape(nbr, nbc)
    pred = PK.intra_pred_plane(recon, jnp.asarray(modes), bs)
    guess = PK.recon_guess_plane(qdct, jnp.asarray(row_qps), pred, bs)
    rc, re, rn = PK.pack_vs_base(recon, jnp.asarray(np.asarray(guess).astype(np.int32)), PK.esc_cap(h, w))
    out = both(PK.host_rebuild_intra_recon, np.asarray(qdct, np.int16),
               modes.astype(np.int32), row_qps, np.asarray(rc),
               np.asarray(re), bs)
    assert np.array_equal(out, np.asarray(recon))

    # wrap diff
    prev = rng.integers(0, 256, (h, w)).astype(np.uint8)
    both(_wrap_diff_u8, curr, prev)


def test_native_x_art_and_recon_joint_match_numpy(monkeypatch):
    """bvc_x_art / bvc_recon_joint vs their NumPy twins — including int16
    extremes that exercise the int32 wrap semantics, and escape codes that
    must be consumed in raster-pixel order."""
    import basic_video_codec_tpu.ops.pack as PK

    if not native.available():
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(11)
    h, w, bs = 48, 64, 8
    nbr, nbc = h // bs, w // bs

    def both(fn, *a, **kw):
        out_native = fn(*a, **kw)
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
        out_np = fn(*a, **kw)
        monkeypatch.undo()
        pairs = (zip(out_native, out_np) if isinstance(out_native, tuple)
                 else [(out_native, out_np)])
        for xn, xp in pairs:
            if xn is None or xp is None:
                assert xn is xp, fn
            else:
                assert np.array_equal(np.asarray(xn), np.asarray(xp)), fn
        return out_native

    # typical sparse coefficients
    q = np.zeros((h, w), np.int16)
    m = rng.random((h, w)) < 0.2
    q[m] = rng.integers(-40, 41, m.sum())
    row_qps = rng.integers(0, 8, nbr).astype(np.int32)
    x, art = both(PK.host_x_art, q, row_qps, bs)
    x2, none_art = both(PK.host_x_art, q, row_qps, bs, False)
    assert none_art is None and np.array_equal(np.asarray(x2), np.asarray(x))

    # int16 extremes: int32 products wrap on device; twins must agree anyway
    qx = rng.integers(-(2 ** 15), 2 ** 15, (h, w)).astype(np.int16)
    both(PK.host_x_art, qx, np.full(nbr, 10, np.int32), bs)

    # fused recon guess + joint corrections, with escapes at known pixels
    pred = rng.integers(0, 256, (h, w)).astype(np.uint8)
    states = np.zeros(h * w, np.uint8)
    states[rng.choice(h * w, 200, replace=False)] = rng.integers(1, 8, 200)
    n_esc = int(np.isin(states, (PK.J_RESC, PK.J_BESC)).sum())
    re = rng.integers(0, 256, max(n_esc, 1)).astype(np.uint8)
    both(PK.host_recon_joint, np.asarray(x), pred, states, re, bs)
