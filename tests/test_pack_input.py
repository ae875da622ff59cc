"""Packed host->device input uploads (ops/pack.unpack_input_chunk +
native bvc_pack_input): lossless round trips, escape-storm fallback, and
end-to-end stream equality vs raw uploads."""

import filecmp

import numpy as np
import pytest

import basic_video_codec_tpu.ops.pack as PK
from basic_video_codec_tpu.entropy import native
from basic_video_codec_tpu.tools import ygen

needs_native = pytest.mark.skipif(not native.available(),
                                  reason="native codec unavailable")


@needs_native
@pytest.mark.parametrize("shape", [(64, 96), (288, 352), (48, 50)])
def test_pack_input_roundtrip(shape):
    h, w = shape
    frames = ygen.moving_sequence(w, h, 4, seed=11)
    cap = PK.input_esc_cap(h, w)
    buf = native.pack_input_frames(frames, cap)
    assert buf is not None
    out = np.asarray(PK.unpack_input_chunk(buf, 4, h, w))
    np.testing.assert_array_equal(out, frames)


@needs_native
def test_pack_input_escape_values():
    """Large deltas (beyond the nibble range) travel as int16 escapes and
    rebuild exactly, including +-255 extremes."""
    h, w = 16, 32
    f = np.zeros((1, h, w), np.uint8)
    f[0, :, ::4] = 255  # delta +255 then -255: every 4th column escapes
    f[0, 3] = np.arange(w) % 256
    cap = PK.input_esc_cap(h, w)
    buf = native.pack_input_frames(f, cap)
    assert buf is not None
    np.testing.assert_array_equal(
        np.asarray(PK.unpack_input_chunk(buf, 1, h, w)), f)


@needs_native
def test_pack_input_escape_storm_falls_back():
    """Noise-like frames exceed the escape cap: the packer reports the
    overflow (None) so the pipeline uploads the chunk raw."""
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (2, 64, 96), np.uint8)
    assert native.pack_input_frames(noise, PK.input_esc_cap(64, 96)) is None


@needs_native
def test_encode_packed_vs_raw_identical(tmp_path, monkeypatch):
    """The packed-upload encode must be byte-identical to the raw-upload
    encode on every artifact (the unpack is exact, so the device programs
    see identical frames)."""
    from basic_video_codec_tpu.config import EncoderConfig, InputParameters
    from basic_video_codec_tpu.io.fileio import FileIOHelper
    from basic_video_codec_tpu.models.pipeline import encode_video

    W, H, N = 96, 64, 7
    y = ygen.moving_sequence(W, H, N, seed=3)

    def run(sub, upack):
        monkeypatch.setenv("BVC_UPACK", upack)
        d = tmp_path / sub
        d.mkdir()
        ygen.write_y_file(str(d / "t.y"), y)
        ec = EncoderConfig(8, 2, 3, 4, nRefFrames=2, fracMeEnabled=True,
                           resolution=(W, H))
        p = InputParameters(str(d / "t.y"), W, H, ec, frames_to_process=N)
        encode_video(p, results_csv_path=None)
        return FileIOHelper(p, create_dirs=False)

    io_p, io_r = run("packed", "1"), run("raw", "0")
    for get in ("get_encoded_file_name", "get_mc_reconstructed_file_name",
                "get_quant_dct_coff_fh_file_name",
                "get_residual_w_mc_file_name",
                "get_residual_wo_mc_file_name", "get_mv_file_name"):
        assert filecmp.cmp(getattr(io_p, get)(), getattr(io_r, get)(),
                           shallow=False), get
