"""Stage breakdown of the headline bench config on the real TPU.

Measures, separately:
  (a) device-only chunk-program throughput (data-dependent chain, one sync),
  (b) + device->host fetch of all outputs (the transfer budget),
  (c) raw d2h bandwidth on a large buffer,
  (d) end-to-end encode_video (what bench.py times),
  (e) host entropy finalize cost per frame (pure host, no device).

Usage: python scripts/profile_tpu.py [--frames N]
"""

import argparse
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 352, 288
BLOCK, R, QP, IPERIOD = 8, 2, 5, 10
CHUNK = int(os.environ.get("BVC_CHUNK", "24"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    args = ap.parse_args()
    logging.disable(logging.INFO)

    import jax
    import jax.numpy as jnp

    from basic_video_codec_tpu.models.chunk import encode_chunk
    from basic_video_codec_tpu.models.pipeline import _finalize_arrays
    from basic_video_codec_tpu.config import EncoderConfig
    from basic_video_codec_tpu.tools import ygen

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    frames = ygen.moving_sequence(W, H, args.frames, seed=42)

    ec = EncoderConfig(BLOCK, R, IPERIOD, QP, resolution=(W, H))
    row_qps = jnp.full(H // BLOCK, QP, jnp.int32)
    budget0 = jnp.float32(0)
    tblq = jnp.zeros(1, jnp.int32)
    tblb = jnp.zeros(1, jnp.float32)
    iqp = jnp.int32(QP)

    def dispatch_all(frames_np):
        """Dispatch the whole sequence as GOP chunks; return list of dev outs."""
        ref = jnp.full((H, W), 128, jnp.uint8)
        hp = jnp.zeros((2 * H, 2 * W), jnp.uint8)
        outs = []
        n = 0
        while n < len(frames_np):
            pos = n % IPERIOD
            k = min(CHUNK, IPERIOD - pos, len(frames_np) - n)
            c = jnp.asarray(frames_np[n : n + k])
            dev = encode_chunk(c, ref, hp, row_qps, budget0, tblq, tblb, iqp,
                               BLOCK, R, False, False, False, pos == 0)
            ref, hp = dev[2], dev[3]
            outs.append(dev)
            n += k
        return outs, ref

    # --- warmup (compile + first-transfer tax)
    t0 = time.time()
    outs, ref = dispatch_all(frames[:24])
    np.asarray(ref)
    print(f"warmup (compile + first d2h): {time.time() - t0:.1f}s", flush=True)

    # (a) device-only: chain all chunks, sync once on the final ref
    fps_a = 0.0
    for rep in range(3):
        t0 = time.time()
        outs, ref = dispatch_all(frames)
        ref.block_until_ready()
        dt = time.time() - t0
        fps_a = max(fps_a, args.frames / dt)
        print(f"(a) device-only chain: {dt:.3f}s = {args.frames / dt:.1f} fps", flush=True)

    # (f) utilization accounting: arithmetic the codec ISSUES per frame vs
    # chip peak.  The point of the numbers is their smallness: one CIF
    # stream cannot feed the chip — the batched sweep lane
    # (models/batch.py, scripts/profile_batch.py) is how the headroom gets
    # spent.  Work model (ops/me.py, ops/transform.py):
    #   SAD: (2r+1)^2 candidates x (|diff| + add) over the whole frame
    #   DCT: D@X@D' fwd + inv = 2 matmuls each of 2*bs^3 FLOP per block
    kind = jax.devices()[0].device_kind
    peaks = {"v5 lite": 197e12, "v5e": 197e12, "v4": 275e12, "v5p": 459e12,
             "v6": 918e12}
    peak = next((v for s, v in peaks.items() if s in kind.lower()), None)
    sad_ops = (2 * R + 1) ** 2 * 2 * H * W            # int ops / frame
    dct_flop = 2 * (2 * 2 * BLOCK ** 3) * (H * W // BLOCK ** 2)  # fwd+inv
    print(f"(f) device kind: {kind}; issued work at {fps_a:.0f} fps device-only:",
          flush=True)
    print(f"(f)   SAD {sad_ops * fps_a / 1e9:.2f} Gop/s, "
          f"DCT {dct_flop * fps_a / 1e9:.2f} GFLOP/s "
          f"({(sad_ops + dct_flop) * fps_a / 1e9:.2f} G total)", flush=True)
    if peak:
        print(f"(f)   vs ~{peak / 1e12:.0f} TFLOP/s bf16 peak: "
              f"{(sad_ops + dct_flop) * fps_a / peak * 100:.4f}% MFU "
              f"-> headroom is spent by batching (profile_batch.py)",
              flush=True)

    # (b) + fetch everything
    def fetch(outs):
        tot = 0
        for dev in outs:
            intra_out, p_out, _, _ = dev
            for part in (intra_out, p_out):
                if part is None:
                    continue
                host = jax.device_get(part)
                tot += sum(a.nbytes for a in host)
        return tot

    for rep in range(3):
        t0 = time.time()
        outs, ref = dispatch_all(frames)
        nbytes = fetch(outs)
        dt = time.time() - t0
        print(f"(b) dispatch+fetch: {dt:.3f}s = {args.frames / dt:.1f} fps "
              f"({nbytes / 1e6:.1f} MB, {nbytes / dt / 1e6:.0f} MB/s incl compute)",
              flush=True)

    # (c) raw d2h bandwidth
    big = jnp.ones((64, H, W), jnp.uint8) + jnp.asarray(frames[0])[None]
    big.block_until_ready()
    for sz_mb in (1, 8, 32):
        n = int(sz_mb * 1e6 // (H * W))
        buf = big[:n]
        buf.block_until_ready()
        t0 = time.time()
        h = jax.device_get(buf)
        dt = time.time() - t0
        print(f"(c) raw d2h {h.nbytes / 1e6:6.1f} MB: {dt * 1000:7.1f} ms "
              f"= {h.nbytes / dt / 1e6:.0f} MB/s", flush=True)

    # (e) host entropy finalize per frame (no device involved)
    outs, _ = dispatch_all(frames[:CHUNK])
    intra_out, p_out, _, _ = outs[0]
    recon_i, art_i, qdct_i, smalls_i = jax.device_get(intra_out)
    recons, arts, qdcts, smalls = jax.device_get(p_out)
    t0 = time.time()
    reps = 0
    while time.time() - t0 < 2.0:
        k = reps % recons.shape[0]
        _finalize_arrays(k + 2, 0, frames[k + 1], recons[k], arts[k], qdcts[k],
                         smalls[k], ec, prev_recon=recons[k - 1] if k else recon_i)
        reps += 1
    dt = (time.time() - t0) / reps
    print(f"(e) host finalize: {dt * 1000:.2f} ms/frame = {1 / dt:.0f} fps-equiv",
          flush=True)

    # (d) end-to-end encode_video
    import shutil
    import tempfile

    from basic_video_codec_tpu.config import InputParameters
    from basic_video_codec_tpu.models.pipeline import encode_video

    tmp = tempfile.mkdtemp(prefix="bvc_prof_")
    try:
        y_path = os.path.join(tmp, "p.y")
        ygen.write_y_file(y_path, frames)
        for rep in range(3):
            params = InputParameters(y_path, W, H, ec, frames_to_process=args.frames)
            t0 = time.time()
            encode_video(params, results_csv_path=None)
            dt = time.time() - t0
            print(f"(d) end-to-end encode_video: {dt:.3f}s = {args.frames / dt:.1f} fps",
                  flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
