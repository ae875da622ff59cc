"""Round-5 measurement suite: the remaining aggregate-throughput legs in
ONE process (the first-d2h tunnel tax is paid once, and each A/B pair is
a same-weather sandwich).

A. Short multi-stream validation: 8 streams x 10 frames CIF, batched
   (fill/drain-dominated shape — the side of the BATCH_MAX_FRAMES
   routing threshold that should win) vs 8 serial passes.
B. Chip-saturation curve: aggregate stream-frames/s vs S for the lane
   as routed (long streams -> sequential serial passes).
C. 720p serving shape: 4 streams x 30 frames block 16, encode + decode
   aggregate (the reference's 300-frame benchmark.y analog).

    python scripts/profile_r5_suite.py
"""

import logging
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_video_codec_tpu.config import EncoderConfig, InputParameters
from basic_video_codec_tpu.models.batch import encode_videos_batched
from basic_video_codec_tpu.models.pipeline import decode_video, encode_video
from basic_video_codec_tpu.tools import ygen
from basic_video_codec_tpu.utils import compcache

compcache.enable()
logging.disable(logging.INFO)

tmp = tempfile.mkdtemp(prefix="bvc_r5_")


def mk(sub, S, N, W=352, H=288, bs=8, qp=5, ip=10):
    out = []
    for s in range(S):
        d = os.path.join(tmp, sub, str(s))
        os.makedirs(d, exist_ok=True)
        y = os.path.join(d, "t.y")
        if not os.path.exists(y):
            ygen.write_y_file(y, ygen.camera_sequence(W, H, N, seed=100 + s,
                                                      cut_at=N // 2))
        out.append(InputParameters(
            y, W, H,
            EncoderConfig(block_size=bs, search_range=2, I_Period=ip,
                          quantization_factor=qp, resolution=(W, H)), N))
    return out


def main():
    # ---- warm all program classes + first-d2h tax
    t0 = time.time()
    encode_videos_batched(mk("wa", 8, 10), results_csv_path=None)  # batched 8x10
    print(f"warm A batched: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    encode_video(mk("ws", 1, 60)[0], results_csv_path=None)        # serial CIF
    print(f"warm serial   : {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    p720 = mk("w7", 1, 30, W=1280, H=720, bs=16, qp=6)[0]          # 720p
    encode_video(p720, results_csv_path=None)
    decode_video(p720)
    print(f"warm 720p     : {time.time() - t0:.1f}s", flush=True)

    # ---- A: short multi-stream sandwich (2 reps)
    print("\n[A] 8 streams x 10 frames CIF", flush=True)
    for rep in range(2):
        t0 = time.time()
        for p in mk(f"as{rep}", 8, 10):
            encode_video(p, results_csv_path=None)
        ts = time.time() - t0
        t0 = time.time()
        res = encode_videos_batched(mk(f"ab{rep}", 8, 10),
                                    results_csv_path=None)
        tb = time.time() - t0
        print(f"  [rep {rep}] serial {ts:5.2f}s = {80 / ts:6.1f} sf/s | "
              f"batched {tb:5.2f}s = {80 / tb:6.1f} sf/s "
              f"(groups={res.n_batched}, speedup {ts / tb:.2f}x)", flush=True)

    # ---- B: saturation curve, lane as routed (long streams -> serial)
    print("\n[B] saturation: aggregate sf/s vs S (60-frame CIF, as routed)",
          flush=True)
    for S in (1, 2, 4, 8, 16):
        best = None
        for rep in range(2):
            runs = mk(f"b{S}_{rep}", S, 60)
            t0 = time.time()
            encode_videos_batched(runs, results_csv_path=None)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"  S={S:2d}: {S * 60 / best:6.1f} sf/s ({best:5.2f}s)",
              flush=True)

    # ---- C: 720p serving shape
    print("\n[C] 720p x 4 streams x 30 frames (block 16)", flush=True)
    for rep in range(2):
        runs = mk(f"c{rep}", 4, 30, W=1280, H=720, bs=16, qp=6)
        t0 = time.time()
        encode_videos_batched(runs, results_csv_path=None)
        te = time.time() - t0
        t0 = time.time()
        for p in runs:
            decode_video(p)
        td = time.time() - t0
        print(f"  [rep {rep}] encode {te:6.2f}s = {120 / te:5.1f} sf/s | "
              f"decode {td:6.2f}s = {120 / td:5.1f} sf/s", flush=True)
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    try:
        main()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
