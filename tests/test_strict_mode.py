"""strict_reference_crashes mode: reproduce the reference's hard failures.

The current reference crashes on (a) any RC-off run whose second I-frame
follows frames that never ran rate control (StatisticsError from
``mean([])``, reference IFrame.py:35) and (b) configs whose RC lookup tables
don't exist (encoder.py:39) — by default this framework degrades gracefully;
strict mode restores the crashes for bug-for-bug studies.
"""

import logging
from statistics import StatisticsError

import pytest

from basic_video_codec_tpu.config import EncoderConfig, InputParameters
from basic_video_codec_tpu.golden.encoder import encode_video as golden_encode
from basic_video_codec_tpu.tools import ygen

logging.getLogger().setLevel(logging.ERROR)

W, H = 64, 48


def _params(tmp_path, n, **cfg):
    y = str(tmp_path / "s.y")
    ygen.write_y_file(y, ygen.moving_sequence(W, H, n, seed=4))
    ec = EncoderConfig(8, 2, 2, 4, resolution=(W, H), backend="golden", **cfg)
    return InputParameters(y, W, H, ec, n)


def test_default_mode_survives_multi_gop_rc_off(tmp_path):
    golden_encode(_params(tmp_path, 4), results_csv_path=None)  # 2 GOPs, no crash


def test_strict_mode_reproduces_statistics_error(tmp_path):
    # QCIF so the lookup tables exist (otherwise the strict loader raises
    # FileNotFoundError first, like the reference's import-order would)
    y = str(tmp_path / "q.y")
    ygen.write_y_file(y, ygen.moving_sequence(176, 144, 4, seed=4))
    ec = EncoderConfig(8, 2, 2, 4, resolution=(176, 144), backend="golden",
                       strict_reference_crashes=True)
    params = InputParameters(y, 176, 144, ec, 4)
    with pytest.raises(StatisticsError):
        golden_encode(params, results_csv_path=None)


def test_strict_mode_requires_lookup_tables(tmp_path):
    # 64x48 has no calibration tables; strict mode crashes like the
    # reference's unconditional loader (encoder.py:39-42)
    params = _params(tmp_path, 1, strict_reference_crashes=True)
    with pytest.raises(FileNotFoundError):
        golden_encode(params, results_csv_path=None)


def test_cli_validate(tmp_path, monkeypatch):
    from basic_video_codec_tpu.__main__ import main

    y = str(tmp_path / "v.y")
    ygen.write_y_file(y, ygen.moving_sequence(W, H, 3, seed=5))
    args = [y, "-W", str(W), "-H", str(H), "-n", "3", "-i", "8", "-r", "2",
            "-q", "4", "--i-period", "2", "--backend", "golden"]
    assert main(["run"] + args) == 0
    assert main(["validate"] + args) == 0
