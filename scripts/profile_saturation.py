"""Chip-saturation curve: aggregate multi-stream throughput vs stream count.

Sweeps S independent same-shape streams through the batch lane's
multi-stream axis (models/batch.py, frames ``in_axes=0``) in ONE process
(the first-d2h tunnel tax is paid once) and prints aggregate
stream-frames/s per S — the number that says what one chip is worth under
this framework and where the host/tunnel saturates it (VERDICT r4 item 9;
single-stream MFU is 0.0018%, PROFILE.md §10, so all remaining headroom is
aggregate).

    python scripts/profile_saturation.py                    # CIF 1..32
    python scripts/profile_saturation.py --width 1280 --height 720 \
        --streams 1,2,4 --bs 16 --frames 30                 # 720p serving
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
from basic_video_codec_tpu.tools import ygen
from basic_video_codec_tpu.utils import compcache

compcache.enable()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", default="1,2,4,8,16,32")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--qp", type=int, default=5)
    ap.add_argument("--iperiod", type=int, default=10)
    ap.add_argument("--width", type=int, default=352)
    ap.add_argument("--height", type=int, default=288)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()
    logging.disable(logging.INFO)
    sweep = [int(s) for s in args.streams.split(",")]
    N, W, H = args.frames, args.width, args.height

    tmp = tempfile.mkdtemp(prefix="bvc_sat_")
    try:
        def mk(sub, S):
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

        # warm: compile the batched programs for every S (each S is its own
        # vmapped program shape) + pay the first-d2h tax once
        for S in sweep:
            t0 = time.time()
            encode_videos_batched(mk("w", S), results_csv_path=None)
            print(f"warm S={S:3d}: {time.time() - t0:6.1f}s", flush=True)

        print(f"\n{'S':>4} {'agg fps':>9} {'per-stream':>10} "
              f"{'wall s':>7}  ({W}x{H}, {N}f, bs{args.bs})", flush=True)
        results = []
        for S in sweep:
            best = None
            for rep in range(args.reps):
                runs = mk(f"r{rep}", S)
                t0 = time.time()
                encode_videos_batched(runs, results_csv_path=None)
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            fps = S * N / best
            results.append((S, fps))
            print(f"{S:>4} {fps:>9.1f} {fps / S:>10.1f} {best:>7.2f}",
                  flush=True)
        if len(results) > 1:
            knee = max(results, key=lambda r: r[1])
            print(f"\npeak aggregate: {knee[1]:.1f} stream-frames/s "
                  f"at S={knee[0]}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
