"""Stage breakdown of the reference's flagship deliverable config on the TPU.

Config: CIF 352x288, block 16, fastME, RCflag 3 @ 2.4 Mbps, I_Period 21
(reference assign3/Deliverable.py:14-45).  Measures, separately:

  (a) device-only fused two-pass chunk chain (one sync at the end),
  (b) dispatch + packed fetch (the transfer budget),
  (d) end-to-end encode_video (run with BVC_PROFILE=1 for the stage table).

Usage: python scripts/profile_deliverable.py [--frames N]
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 352, 288
BLOCK, QP, IPERIOD, TARGET_BR = 16, 5, 21, 2_400_000
CHUNK = int(os.environ.get("BVC_CHUNK", "24"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=84)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    logging.disable(logging.INFO)

    import jax
    import jax.numpy as jnp

    from basic_video_codec_tpu.config import EncoderConfig
    from basic_video_codec_tpu.golden.encoder import _load_rc_table
    from basic_video_codec_tpu.models.pipeline import (MAX_CHUNK,
                                                       _prev_avg_qp,
                                                       _table_arrays)
    from basic_video_codec_tpu.models.two_pass import encode_chunk_two_pass
    from basic_video_codec_tpu.ops import pack as PK
    from basic_video_codec_tpu.rc.rate_control import bit_budget_per_frame
    from basic_video_codec_tpu.tools import ygen

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    frames = ygen.moving_sequence(W, H, args.frames, seed=42)

    ec = EncoderConfig(BLOCK, 1, IPERIOD, QP, resolution=(W, H),
                       fastME=True, RCflag=3, targetBR=TARGET_BR)
    ec.validate()
    _load_rc_table(ec)
    tbl_np = _table_arrays(ec)
    tbl = (jnp.asarray(tbl_np[0]), jnp.asarray(tbl_np[1]))
    budget0 = jnp.float32(bit_budget_per_frame(ec))
    initial_qp = jnp.int32(ec.quantization_factor)
    nbr_total = H // BLOCK
    exp_p = float(ec.rc_lookup_table[QP]["P"] * nbr_total)
    exp_p_frame = jnp.float32(exp_p)
    int8q = PK.qdct_int8_safe(ec)
    mv8 = PK.mv_int8_safe(ec)
    q4 = PK.qdct_nibble_safe(ec)
    qfrac = PK.qcap_fraction(ec)
    print(f"transport: int8q={int8q} mv8={mv8} q4={q4} qfrac={qfrac}",
          flush=True)

    def dispatch_all(frames_np, compact=True, tail=True):
        R = 1
        gray = jnp.full((H, W), 128, jnp.uint8)
        ref = jnp.zeros((R, H, W), jnp.uint8).at[0].set(gray)
        hp = jnp.zeros((R, 2 * H, 2 * W), jnp.uint8)
        nv = jnp.int32(1)
        prev_avg = jnp.int32(_prev_avg_qp([QP], ec))
        outs = []
        n = 0
        while n < len(frames_np):
            pos = n % IPERIOD
            k = min(CHUNK, IPERIOD - pos, len(frames_np) - n)
            c = jnp.asarray(frames_np[n : n + k])
            dev, ref, hp, nv, prev_avg = encode_chunk_two_pass(
                c, ref, hp, nv, prev_avg, budget0, tbl[0], tbl[1],
                exp_p_frame, initial_qp, BLOCK, 0, True, False, pos == 0,
                compact=compact, int8q=int8q, mv8=mv8, q4=q4, tail=tail,
                qfrac=qfrac)
            outs.append(dev)
            n += k
        return outs, ref

    # --- warmup (compile + first-transfer tax)
    t0 = time.time()
    outs, ref = dispatch_all(frames[: min(42, args.frames)])
    np.asarray(ref)
    print(f"warmup (compile + first d2h): {time.time() - t0:.1f}s", flush=True)

    # (a) device-only: chain all chunks, sync once on the final ref
    for rep in range(args.reps):
        t0 = time.time()
        outs, ref = dispatch_all(frames)
        ref.block_until_ready()
        dt = time.time() - t0
        print(f"(a) device-only two-pass chain: {dt:.3f}s = "
              f"{args.frames / dt:.1f} fps", flush=True)

    # (b) + fetch the packed buffers
    for rep in range(args.reps):
        t0 = time.time()
        outs, ref = dispatch_all(frames)
        tot = 0
        for dev in outs:
            buf = jax.device_get(dev[4])
            tot += buf.nbytes
        dt = time.time() - t0
        print(f"(b) dispatch+packed fetch: {dt:.3f}s = {args.frames / dt:.1f} "
              f"fps ({tot / 1e6:.1f} MB = "
              f"{tot / args.frames / 1e3:.1f} KB/frame cap-sized)", flush=True)

    # (d) end-to-end encode_video
    import shutil
    import tempfile

    from basic_video_codec_tpu.config import InputParameters
    from basic_video_codec_tpu.models.pipeline import encode_video

    tmp = tempfile.mkdtemp(prefix="bvc_prof_")
    try:
        y_path = os.path.join(tmp, "p.y")
        ygen.write_y_file(y_path, frames)
        for rep in range(args.reps):
            params = InputParameters(y_path, W, H, ec,
                                     frames_to_process=args.frames)
            t0 = time.time()
            encode_video(params, results_csv_path=None)
            dt = time.time() - t0
            print(f"(d) end-to-end encode_video: {dt:.3f}s = "
                  f"{args.frames / dt:.1f} fps", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
