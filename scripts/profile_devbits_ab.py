"""Sandwich A/B: devbits vs q-prefix transport in ONE process (same
weather window), bench config and deliverable config.

Alternates BVC_DEVBITS=1/0 runs (the transport flag is read per encode in
models/pipeline._run_chunked) and prints per-variant times + medians.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_devbits_ab.py
"""

import logging
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.disable(logging.INFO)

from basic_video_codec_tpu.config import EncoderConfig, InputParameters
from basic_video_codec_tpu.models.pipeline import encode_video
from basic_video_codec_tpu.tools import ygen
from basic_video_codec_tpu.utils import compcache

compcache.enable()

W, H, N = 352, 288, 240
REPS = 4  # per variant per config


def main():
    tmp = tempfile.mkdtemp(prefix="bvc_ab_")
    try:
        y = os.path.join(tmp, "t.y")
        ygen.write_y_file(y, ygen.moving_sequence(W, H, N, seed=42))

        def run(cfg, n):
            p = InputParameters(y, W, H, EncoderConfig(**cfg), n)
            t0 = time.time()
            encode_video(p, results_csv_path=None)
            return time.time() - t0

        configs = {
            "bench (full-search b8 r2 qp5 ip10)": dict(
                block_size=8, search_range=2, I_Period=10,
                quantization_factor=5, resolution=(W, H)),
            "deliverable (RC3 fastME b16)": dict(
                block_size=16, search_range=1, I_Period=21,
                quantization_factor=5, fastME=True, RCflag=3,
                targetBR=2_400_000, resolution=(W, H)),
        }
        for name, cfg in configs.items():
            for v in ("1", "0"):  # compile both variants
                os.environ["BVC_DEVBITS"] = v
                run(cfg, 40)
            times = {"1": [], "0": []}
            for _ in range(REPS):
                for v in ("1", "0"):
                    os.environ["BVC_DEVBITS"] = v
                    times[v].append(run(cfg, N))
            for v, tag in (("1", "devbits "), ("0", "q-prefix")):
                ts = times[v]
                print(f"{name} | {tag}: "
                      + " ".join(f"{N / t:6.1f}" for t in ts)
                      + f" fps | median {N / statistics.median(ts):6.1f}"
                      + f" best {N / min(ts):6.1f}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
