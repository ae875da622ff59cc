"""Multi-stream serving profile: N independent sequences batched into one
vmapped program vs N serial encode_video passes (models/batch.py multi-
stream lane).  Long sequences (throughput mode, fill/drain amortized).

NOTE: encode_videos_batched routes multi-stream groups longer than
BVC_BATCH_MAX_FRAMES (default MAX_CHUNK) through the serial loop —
measured faster there (PROFILE.md §12b).  To profile the vmapped
multi-stream lane itself at long N, set BVC_BATCH_MAX_FRAMES=100000.

    python scripts/profile_streams.py [--streams 8] [--frames 60]
    python scripts/profile_streams.py --width 1280 --height 720 \
        --streams 4 --bs 16   # production-ish 720p serving shape
"""

import argparse
import logging
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from basic_video_codec_tpu.config import EncoderConfig, InputParameters
from basic_video_codec_tpu.models.batch import encode_videos_batched
from basic_video_codec_tpu.models.pipeline import encode_video
from basic_video_codec_tpu.tools import ygen
from basic_video_codec_tpu.utils import compcache

compcache.enable()

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=8)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--qp", type=int, default=5)
    ap.add_argument("--iperiod", type=int, default=10)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--width", type=int, default=352)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--decode", action="store_true",
                    help="also time serial decode_video over one rep's trees")
    ap.add_argument("--profile", action="store_true",
                    help="keep INFO logging so BVC_PROFILE=1 stage tables "
                         "from the batch lane and serial passes print")
    args = ap.parse_args()
    if not args.profile:
        logging.disable(logging.INFO)
    S, N = args.streams, args.frames
    W, H = args.width, args.height

    tmp = tempfile.mkdtemp(prefix="bvc_streams_")
    try:
        def mk(sub):
            out = []
            for s in range(S):
                d = os.path.join(tmp, sub, str(s))
                os.makedirs(d, exist_ok=True)
                y = os.path.join(d, "t.y")
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

        warm_b, warm_s = mk("wb"), mk("ws")
        t0 = time.time()
        encode_videos_batched(warm_b, results_csv_path=None)
        print(f"warm batched: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        encode_video(warm_s[0], results_csv_path=None)
        print(f"warm serial : {time.time() - t0:.1f}s", flush=True)

        for rep in range(args.reps):
            serial = mk(f"s{rep}")
            t0 = time.time()
            for p in serial:
                encode_video(p, results_csv_path=None)
            ts = time.time() - t0
            batched = mk(f"b{rep}")
            t0 = time.time()
            encode_videos_batched(batched, results_csv_path=None)
            tb = time.time() - t0
            cf = S * N
            print(f"[rep {rep}] serial {S} passes: {ts:6.2f}s = "
                  f"{cf / ts:6.1f} stream-frames/s | batched: {tb:6.2f}s = "
                  f"{cf / tb:6.1f} stream-frames/s | speedup "
                  f"{ts / tb:.2f}x", flush=True)
            if args.decode and rep == args.reps - 1:
                from basic_video_codec_tpu.models.pipeline import decode_video

                decode_video(serial[0])  # compile
                t0 = time.time()
                for p in serial:
                    decode_video(p)
                td = time.time() - t0
                print(f"decode {S} serial passes: {td:6.2f}s = "
                      f"{cf / td:6.1f} stream-frames/s", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
