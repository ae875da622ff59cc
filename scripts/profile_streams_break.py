"""Multi-stream batch-lane breakdown: where does the 8-stream loss go?

Measures, in ONE process (same weather): the serial 8-pass baseline, then
the batched multi-stream lane across pipeline depth / transport / chunk
size, with a cleared per-run BVC_PROFILE stage table for the default
configuration.  Run alone on the box.

    python scripts/profile_streams_break.py [--streams 8] [--frames 60]
"""

import argparse
import logging
import os
import shutil
import sys
import tempfile
import time

os.environ["BVC_PROFILE"] = "1"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_video_codec_tpu.config import EncoderConfig, InputParameters
from basic_video_codec_tpu.models import batch as B
from basic_video_codec_tpu.models import pipeline
from basic_video_codec_tpu.models.pipeline import encode_video
from basic_video_codec_tpu.tools import ygen
from basic_video_codec_tpu.utils import compcache

compcache.enable()

W, H = 352, 288


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--qp", type=int, default=5)
    ap.add_argument("--iperiod", type=int, default=10)
    args = ap.parse_args()
    logging.getLogger().setLevel(logging.INFO)
    logging.disable(logging.INFO)  # keep the stage table via explicit report
    S, N = args.streams, args.frames

    tmp = tempfile.mkdtemp(prefix="bvc_sb_")
    try:
        def mk(sub):
            out = []
            for s in range(S):
                d = os.path.join(tmp, sub, str(s))
                os.makedirs(d, exist_ok=True)
                y = os.path.join(d, "t.y")
                if not os.path.exists(y):
                    ygen.write_y_file(
                        y, ygen.camera_sequence(W, H, N, seed=100 + s,
                                                cut_at=N // 2))
                out.append(InputParameters(
                    y, W, H,
                    EncoderConfig(block_size=args.bs, search_range=2,
                                  I_Period=args.iperiod,
                                  quantization_factor=args.qp,
                                  resolution=(W, H)), N))
            return out

        def run_batched(sub, devbits=True, depth=None, chunk=None):
            os.environ["BVC_DEVBITS"] = "1" if devbits else "0"
            if chunk is not None:
                os.environ["BVC_BATCH_CHUNK"] = str(chunk)
            old_depth = B.DEPTH
            if depth is not None:
                B.DEPTH = depth
            try:
                pipeline.STAGE_TIMER.totals.clear()
                pipeline.STAGE_TIMER.counts.clear()
                t0 = time.time()
                B._encode_group(mk(sub), None)
                return time.time() - t0
            finally:
                B.DEPTH = old_depth
                os.environ.pop("BVC_DEVBITS", None)
                os.environ.pop("BVC_BATCH_CHUNK", None)

        cf = S * N
        t = run_batched("w")  # warm (compile + first-d2h)
        print(f"warm batched: {t:.1f}s", flush=True)
        t0 = time.time()
        for p in mk("ws"):
            encode_video(p, results_csv_path=None)
        print(f"warm serial : {time.time() - t0:.1f}s", flush=True)

        t0 = time.time()
        for p in mk("s0"):
            encode_video(p, results_csv_path=None)
        ts = time.time() - t0
        print(f"serial 8 passes : {ts:6.2f}s = {cf / ts:6.1f} sf/s", flush=True)

        t = run_batched("b0")
        print(f"batched default (devbits, DEPTH=2): {t:6.2f}s = "
              f"{cf / t:6.1f} sf/s", flush=True)
        print(pipeline.STAGE_TIMER.report(), flush=True)

        for depth in (4, 6):
            t = run_batched(f"bd{depth}", depth=depth)
            print(f"batched DEPTH={depth}: {t:6.2f}s = {cf / t:6.1f} sf/s",
                  flush=True)
        t = run_batched("bq", devbits=False)
        print(f"batched q-prefix: {t:6.2f}s = {cf / t:6.1f} sf/s", flush=True)
        for chunk in (5, 10):
            t = run_batched(f"bc{chunk}", chunk=chunk)
            print(f"batched CHUNK={chunk}: {t:6.2f}s = {cf / t:6.1f} sf/s",
                  flush=True)
        # second serial leg closes the weather sandwich
        t0 = time.time()
        for p in mk("s1"):
            encode_video(p, results_csv_path=None)
        ts = time.time() - t0
        print(f"serial 8 passes : {ts:6.2f}s = {cf / ts:6.1f} sf/s", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
