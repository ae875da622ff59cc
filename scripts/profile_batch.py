"""Batched-sweep profiling on the real TPU: serial per-cell loop vs the
vmapped batch lane (models/batch.py), on the reference's RD-sweep grid
(reference assign1/ex4_plots.py:131-257 — block sizes x I_Periods x QPs).

Prints per-mode wall time, aggregate config-frames/s, and the speedup.
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


def main():
    tmp = tempfile.mkdtemp(prefix="bvc_batch_prof_")
    try:
        y = ygen.camera_sequence(W, H, N, seed=5, cut_at=6)
        for sub in ("serial", "batched", "warm"):
            d = os.path.join(tmp, sub)
            os.makedirs(d)
            ygen.write_y_file(os.path.join(d, "t.y"), y)

        # warm the compile caches for both modes (first compile 20-40 s per
        # program class, plus the first-d2h tunnel tax)
        warm = cells(os.path.join(tmp, "warm"))
        t0 = time.time()
        encode_videos_batched(warm, results_csv_path=None)
        print(f"warm batched: {time.time() - t0:.1f}s", flush=True)
        t0 = time.time()
        for i, p in enumerate(warm):
            encode_video(p, results_csv_path=None)
            print(f"warm serial {i + 1}/{len(warm)}: "
                  f"{time.time() - t0:.1f}s", flush=True)
        print(f"warm serial : {time.time() - t0:.1f}s", flush=True)

        n_cells = len(cells(os.path.join(tmp, "serial")))
        t0 = time.time()
        for p in cells(os.path.join(tmp, "serial")):
            encode_video(p, results_csv_path=None)
        t_serial = time.time() - t0

        t0 = time.time()
        res = encode_videos_batched(cells(os.path.join(tmp, "batched")),
                                    results_csv_path=None)
        t_batched = time.time() - t0

        cf = n_cells * N
        print(f"cells: {n_cells} x {N} frames = {cf} config-frames "
              f"({res.n_batched} batched groups)")
        print(f"serial loop : {t_serial:7.2f} s = {cf / t_serial:7.1f} config-frames/s")
        print(f"batch lane  : {t_batched:7.2f} s = {cf / t_batched:7.1f} config-frames/s")
        print(f"speedup     : {t_serial / t_batched:.2f}x")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
