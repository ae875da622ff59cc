"""Stage breakdown of ONE batched sweep group vs its serial cells.

Isolates where the batch lane's per-group time goes (dispatch / prefetch /
fetch / rebuild / finalize / write) so the fixed costs that cap short-cell
sweeps are visible.  BVC_PROFILE is forced on; run alone on the box.

    python scripts/profile_batch_break.py [--frames N] [--qps 1,4,7,10]
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
from basic_video_codec_tpu.models import pipeline
from basic_video_codec_tpu.models.batch import _encode_group
from basic_video_codec_tpu.models.pipeline import encode_video
from basic_video_codec_tpu.tools import ygen
from basic_video_codec_tpu.utils import compcache

compcache.enable()

W, H = 352, 288


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--qps", default="1,4,7,10")
    ap.add_argument("--bs", type=int, default=16)
    ap.add_argument("--iperiod", type=int, default=4)
    args = ap.parse_args()
    logging.getLogger().setLevel(logging.INFO)
    qps = [int(q) for q in args.qps.split(",")]
    N = args.frames

    tmp = tempfile.mkdtemp(prefix="bvc_bb_")
    try:
        y = ygen.camera_sequence(W, H, N, seed=5, cut_at=max(2, N // 2))
        for sub in ("b", "s"):
            d = os.path.join(tmp, sub)
            os.makedirs(d)
            ygen.write_y_file(os.path.join(d, "t.y"), y)

        def cells(sub):
            return [InputParameters(
                os.path.join(tmp, sub, "t.y"), W, H,
                EncoderConfig(block_size=args.bs, search_range=2,
                              I_Period=args.iperiod, quantization_factor=q,
                              resolution=(W, H)), N) for q in qps]

        # warm both paths (compiles + first-d2h; persistent cache helps)
        _encode_group(cells("b"), None)
        encode_video(cells("s")[0], results_csv_path=None)

        pipeline.STAGE_TIMER.totals.clear()
        pipeline.STAGE_TIMER.counts.clear()
        print("=== batched group ===", flush=True)
        t0 = time.time()
        _encode_group(cells("b"), None)
        tb = time.time() - t0
        print(f"batched: {tb:.3f}s = {len(qps) * N / tb:.1f} config-frames/s",
              flush=True)

        pipeline.STAGE_TIMER.totals.clear()
        pipeline.STAGE_TIMER.counts.clear()
        print("=== serial cells ===", flush=True)
        t0 = time.time()
        for p in cells("s"):
            encode_video(p, results_csv_path=None)
        ts = time.time() - t0
        print(f"serial : {ts:.3f}s = {len(qps) * N / ts:.1f} config-frames/s "
              f"(speedup {ts / tb:.2f}x)", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
