"""Batched-sweep profiling on the real TPU: serial per-cell loop vs the
vmapped batch lane (models/batch.py), on the reference's RD-sweep grid
(reference assign1/ex4_plots.py:131-257 — block sizes x I_Periods x QPs).

Prints per-mode wall time, aggregate config-frames/s, and the speedup —
and a same-process devbits-vs-q-prefix transport A/B for the batch lane
(the two runs interleave rep-by-rep, so both see the same tunnel weather).
Run alone on the box (concurrent pytest runs starve the writer thread).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_batch.py
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
from basic_video_codec_tpu.models.pipeline import encode_video
from basic_video_codec_tpu.tools import ygen
from basic_video_codec_tpu.utils import compcache

compcache.enable()

if os.environ.get("BVC_PROFILE", "0") == "0":
    logging.disable(logging.INFO)  # keep INFO for the BVC_PROFILE stage tables

W, H, N = 352, 288, 10
QPS = {8: [0, 3, 6, 9], 16: [1, 4, 7, 10]}
I_PERIODS = tuple(int(x) for x in
                  os.environ.get("BVC_PROF_IPS", "1,4,10").split(","))


def cells(root):
    out = []
    for bs in (8, 16):
        for ip in I_PERIODS:
            for qp in QPS[bs]:
                ec = EncoderConfig(block_size=bs, search_range=2, I_Period=ip,
                                   quantization_factor=qp, resolution=(W, H))
                out.append(InputParameters(os.path.join(root, "t.y"),
                                           W, H, ec, N))
    return out


REPS = int(os.environ.get("BVC_PROF_REPS", "3"))


def main():
    tmp = tempfile.mkdtemp(prefix="bvc_batch_prof_")
    try:
        y = ygen.camera_sequence(W, H, N, seed=5, cut_at=6)
        for sub in ("serial", "bdev", "bqp", "warm"):
            d = os.path.join(tmp, sub)
            os.makedirs(d)
            ygen.write_y_file(os.path.join(d, "t.y"), y)

        def batched(sub, devbits):
            os.environ["BVC_DEVBITS"] = "1" if devbits else "0"
            try:
                t0 = time.time()
                res = encode_videos_batched(cells(os.path.join(tmp, sub)),
                                            results_csv_path=None)
                return time.time() - t0, res
            finally:
                os.environ.pop("BVC_DEVBITS", None)

        # warm the compile caches for all three modes (first compile
        # 20-40 s per program class, plus the first-d2h tunnel tax)
        warm = cells(os.path.join(tmp, "warm"))
        t0 = time.time()
        os.environ["BVC_DEVBITS"] = "1"
        encode_videos_batched(warm, results_csv_path=None)
        print(f"warm batched devbits : {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        os.environ["BVC_DEVBITS"] = "0"
        encode_videos_batched(warm, results_csv_path=None)
        os.environ.pop("BVC_DEVBITS", None)
        print(f"warm batched q-prefix: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for i, p in enumerate(warm):
            encode_video(p, results_csv_path=None)
        print(f"warm serial : {time.time() - t0:.1f}s", flush=True)

        n_cells = len(cells(os.path.join(tmp, "serial")))
        cf = n_cells * N
        ts, tdev, tqp = [], [], []
        n_groups = 0
        for rep in range(REPS):
            t0 = time.time()
            for p in cells(os.path.join(tmp, "serial")):
                encode_video(p, results_csv_path=None)
            ts.append(time.time() - t0)
            dt, res = batched("bdev", devbits=True)
            tdev.append(dt)
            n_groups = res.n_batched
            dt, _ = batched("bqp", devbits=False)
            tqp.append(dt)
            print(f"[rep {rep}] serial {ts[-1]:6.2f}s | batched devbits "
                  f"{tdev[-1]:6.2f}s | batched q-prefix {tqp[-1]:6.2f}s",
                  flush=True)

        print(f"\ncells: {n_cells} x {N} frames = {cf} config-frames "
              f"({n_groups} batched groups); best of {REPS}")
        bs_, bd, bq = min(ts), min(tdev), min(tqp)
        print(f"serial loop      : {bs_:7.2f} s = {cf / bs_:7.1f} config-frames/s")
        print(f"batch (devbits)  : {bd:7.2f} s = {cf / bd:7.1f} config-frames/s "
              f"({bs_ / bd:.2f}x vs serial)")
        print(f"batch (q-prefix) : {bq:7.2f} s = {cf / bq:7.1f} config-frames/s "
              f"({bs_ / bq:.2f}x vs serial)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
