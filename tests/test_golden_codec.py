"""End-to-end golden encode/decode conformance on synthetic video.

The codec's core invariant (model: reference tests/test_decoder.py): the
decoder's output must equal the encoder's reconstructed frames bit-exactly —
the bitstream alone carries everything needed.
"""

import os

import numpy as np
import pytest

from basic_video_codec_tpu.config import EncoderConfig, InputParameters
from basic_video_codec_tpu.golden.encoder import encode_video
from basic_video_codec_tpu.golden.decoder import decode_video
from basic_video_codec_tpu.io.fileio import FileIOHelper
from basic_video_codec_tpu.tools import ygen

W, H, N = 64, 48, 5


def _run(tmp_path, name, **cfg):
    y_path = str(tmp_path / f"{name}.y")
    ygen.write_y_file(y_path, ygen.moving_sequence(W, H, N, seed=11))
    defaults = dict(block_size=8, search_range=2, I_Period=4, quantization_factor=3,
                    resolution=(W, H), backend="golden")
    defaults.update(cfg)
    ec = EncoderConfig(**defaults)
    params = InputParameters(y_path, W, H, ec, frames_to_process=N)
    encode_video(params, results_csv_path=str(tmp_path / "results.csv"))
    decode_video(params)
    return params, FileIOHelper(params, create_dirs=False)


def _read_planes(path, w, h, dtype=np.uint8):
    data = np.fromfile(path, dtype=dtype)
    px = w * h
    return data.reshape(-1, h, w) if data.size % px == 0 else None


CONFIGS = [
    ("intra_only", dict(I_Period=1, quantization_factor=2)),
    ("ip_fullsearch", dict()),
    ("ip_qp0", dict(quantization_factor=0)),
    ("fastme", dict(fastME=True)),
    ("fracme", dict(fracMeEnabled=True)),
    ("nref3", dict(nRefFrames=3)),
    ("fastme_fracme", dict(fastME=True, fracMeEnabled=True)),
]


@pytest.mark.parametrize("name,cfg", CONFIGS, ids=[c[0] for c in CONFIGS])
def test_decode_matches_reconstruction(tmp_path, name, cfg):
    params, io = _run(tmp_path, name, **cfg)
    recon = _read_planes(io.get_mc_reconstructed_file_name(), W, H)
    decoded = _read_planes(io.get_mc_decoded_file_name(), W, H)
    assert recon is not None and decoded is not None
    assert recon.shape == decoded.shape == (N, H, W)
    assert np.array_equal(recon, decoded), f"decode mismatch for {name}"


def test_artifact_tree(tmp_path):
    params, io = _run(tmp_path, "artifacts")
    for path in [
        io.get_mv_file_name(),
        io.get_metrics_csv_file_name(),
        io.get_residual_w_mc_file_name(),
        io.get_residual_wo_mc_file_name(),
        io.get_quant_dct_coff_fh_file_name(),
        io.get_encoded_file_name(),
        io.get_mc_reconstructed_file_name(),
        io.get_mc_decoded_file_name(),
    ]:
        assert os.path.exists(path), path
    # config identity encoded in the directory name (reference file_io.py:20)
    assert "8_2_3_4_1_0_0" in io.get_encoded_file_name()
    # metrics.csv has a header + one row per frame
    with open(io.get_metrics_csv_file_name()) as f:
        lines = [l for l in f.read().splitlines() if l]
    assert len(lines) == 1 + N
    assert lines[0].startswith("idx,I-Frame,avg_MAE")


def test_bitstream_framing(tmp_path):
    params, io = _run(tmp_path, "framing")
    with open(io.get_encoded_file_name(), "rb") as f:
        data = f.read()
    pos = 0
    modes = []
    for _ in range(N):
        mode = data[pos]; pos += 1
        assert mode in (0, 1)
        modes.append(mode)
        pred_len = int.from_bytes(data[pos : pos + 2]); pos += 2
        pos += pred_len
        dct_len = int.from_bytes(data[pos : pos + 3]); pos += 3
        pos += dct_len
    assert pos == len(data)
    # I_Period=4, 5 frames -> I P P P I
    assert modes == [1, 0, 0, 0, 1]


def test_reconstruction_quality_improves_with_lower_qp(tmp_path):
    psnrs = {}
    sizes = {}
    for qp in (0, 6):
        params, io = _run(tmp_path, f"qp{qp}", quantization_factor=qp)
        recon = _read_planes(io.get_mc_reconstructed_file_name(), W, H)
        src = ygen.moving_sequence(W, H, N, seed=11)
        mse = np.mean((recon.astype(np.float64) - src) ** 2)
        psnrs[qp] = 10 * np.log10(255 ** 2 / mse)
        sizes[qp] = os.path.getsize(io.get_encoded_file_name())
    assert psnrs[0] > psnrs[6]          # lower QP -> better quality
    assert sizes[0] > sizes[6]          # ... and more bits


def test_mv_file_contents(tmp_path):
    from basic_video_codec_tpu.io.fileio import parse_mv

    params, io = _run(tmp_path, "mvfile")
    with open(io.get_mv_file_name()) as f:
        lines = f.read().splitlines()
    assert len(lines) == N
    assert lines[0] == ""  # I-frame writes a bare newline
    mvs = parse_mv(lines[1])
    assert len(mvs) == (W // 8) * (H // 8)


def test_non_multiple_resolution_pads_and_round_trips(tmp_path):
    """Non-block-multiple dims: frames are padded and the entropy structure
    follows the padded geometry consistently (the reference mixes configured
    and padded dims and crashes here — documented divergence, PARITY.md)."""
    Wn, Hn, Nn = 100, 60, 3  # pads to 112x64 at block 16
    y_path = str(tmp_path / "odd.y")
    ygen.write_y_file(y_path, ygen.moving_sequence(Wn, Hn, Nn, seed=2))
    ec = EncoderConfig(16, 2, 2, 4, resolution=(Wn, Hn), backend="golden")
    params = InputParameters(y_path, Wn, Hn, ec, Nn)
    encode_video(params, results_csv_path=None)
    decode_video(params)
    io = FileIOHelper(params, create_dirs=False)
    pw, ph = 112, 64
    rec = np.fromfile(io.get_mc_reconstructed_file_name(), np.uint8)
    dec = np.fromfile(io.get_mc_decoded_file_name(), np.uint8)
    assert rec.size == pw * ph * Nn
    assert np.array_equal(rec, dec)
