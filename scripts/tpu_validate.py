"""Real-hardware validation sweep for the TPU compute path.

The CPU test suite (tests/, virtual 8-device mesh) proves conformance of
the XLA paths; the Pallas kernels compile differently on the real chip
(Mosaic), where interpret mode catches none of the backend's constraints
(CLAUDE.md gotchas).  This script re-proves, ON the attached TPU:

1. Pallas fastME walk (ops/fastme_pallas.py) decision parity vs the XLA
   scan x while implementation — mvs, sads AND comparison counts — across
   block sizes, references, warm-up masking and half-pel.
2. Pallas full-search parity vs the XLA candidate scan (bench config).
3. End-to-end: the reference deliverable config (CIF RC3 + fastME) under
   the integer-exact transform produces a bitstream byte-identical to the
   golden NumPy oracle, and decode == encoder reconstruction — run TWICE:
   once on the default devbits transport (the device packs the final
   exp-Golomb bitstreams, ops/bitpack.py) and once with BVC_DEVBITS=0
   (the q-prefix transport), so both transports keep real-chip parity
   evidence.
4. A 720p smoke encode/decode (decode == recon) — the compact-transfer
   caps and kernels at a production-ish resolution.
5. Batch lane (models/batch.py) on the real chip: batched-vs-serial
   byte-identity under ``exact_transform`` for one QP group and one
   mixed-I_Period group, and the float-mode PSNR/bits tolerance check
   (vmapped float32-DCT HLO is its own ±1-edge class, PARITY.md
   divergence 6, so float mode asserts tolerances, not bytes).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_validate.py
Exits non-zero on any mismatch.  Takes a few minutes (compiles).
"""

import filecmp
import logging
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

logging.disable(logging.INFO)


def check(ok, msg):
    print(("PASS  " if ok else "FAIL  ") + msg, flush=True)
    if not ok:
        sys.exit(1)


def fastme_parity():
    import jax
    import jax.numpy as jnp

    from basic_video_codec_tpu.golden.interp import build_pre_interpolated_buffer
    from basic_video_codec_tpu.ops.fastme import fast_search_frame
    from basic_video_codec_tpu.ops.fastme_pallas import fast_search_frame_pallas
    from basic_video_codec_tpu.tools import ygen

    os.environ["BVC_PALLAS_FASTME"] = "0"  # force the XLA reference path
    cases = [
        (288, 352, 16, 1, False, None),
        (288, 352, 16, 2, False, None),
        (288, 352, 16, 3, False, 2),
        (288, 352, 16, 1, True, None),
        (288, 352, 8, 1, False, None),
        (288, 352, 8, 2, True, None),
    ]
    for h, w, bs, n_ref, frac, nv in cases:
        base = ygen.moving_sequence(w, h, n_ref + 1, seed=42)
        refs = np.stack([base[i] for i in range(n_ref)])
        curr = base[n_ref]
        hps = (np.stack([build_pre_interpolated_buffer(r) for r in refs])
               if frac else np.zeros((n_ref, 2 * h, 2 * w), np.uint8))
        nvj = None if nv is None else jnp.int32(nv)
        args = (jnp.asarray(curr), jnp.asarray(refs), jnp.asarray(hps), bs, frac)
        mx = fast_search_frame(*args, n_valid=nvj)
        mp = fast_search_frame_pallas(*args, n_valid=nvj)
        ok = all(np.array_equal(np.asarray(a), np.asarray(b))
                 for a, b in zip(mx, mp))
        check(ok, f"fastME walk parity bs={bs} refs={n_ref} frac={frac} nv={nv}")
    del os.environ["BVC_PALLAS_FASTME"]


def fullsearch_parity():
    import jax.numpy as jnp

    from basic_video_codec_tpu.ops.me import full_search
    from basic_video_codec_tpu.ops.pallas_me import full_search_pallas, use_pallas
    from basic_video_codec_tpu.tools import ygen

    h, w, bs, r = 288, 352, 8, 2
    if not use_pallas(h, w, bs, r, frac=False, n_ref=1):
        print("SKIP  full-search pallas (gate off for this shape)")
        return
    base = ygen.moving_sequence(w, h, 2, seed=7)
    hps = jnp.zeros((1, 2 * h, 2 * w), jnp.uint8)
    a = (jnp.asarray(base[1]), jnp.asarray(base[0])[None], hps, bs, r, False)
    mx = full_search(*a)
    mp = full_search_pallas(*a)
    ok = all(np.array_equal(np.asarray(x), np.asarray(y))
             for x, y in zip(mx[:2], mp[:2]))
    check(ok, "full-search pallas parity (bench config)")


def deliverable_golden(devbits=True):
    from basic_video_codec_tpu.config import EncoderConfig, InputParameters
    from basic_video_codec_tpu.golden.encoder import encode_video as golden_encode
    from basic_video_codec_tpu.io.fileio import FileIOHelper
    from basic_video_codec_tpu.models.pipeline import decode_video as tpu_decode
    from basic_video_codec_tpu.models.pipeline import encode_video as tpu_encode
    from basic_video_codec_tpu.tools import ygen

    W, H, N = 352, 288, 8
    tag = "devbits" if devbits else "q-prefix"
    os.environ["BVC_DEVBITS"] = "1" if devbits else "0"
    tmp = tempfile.mkdtemp(prefix="bvc_val_")
    y = ygen.moving_sequence(W, H, N, seed=5)
    ios = {}
    for sub, enc in (("g", golden_encode), ("t", tpu_encode)):
        d = os.path.join(tmp, sub)
        os.makedirs(d, exist_ok=True)
        ygen.write_y_file(os.path.join(d, "s.y"), y)
        ec = EncoderConfig(block_size=16, search_range=16, I_Period=8,
                           quantization_factor=4, fastME=True, RCflag=3,
                           targetBR=2_400_000, resolution=(W, H),
                           exact_transform=True)
        p = InputParameters(os.path.join(d, "s.y"), W, H, ec,
                            frames_to_process=N)
        enc(p, results_csv_path=None)
        if sub == "t":
            tpu_decode(p)
        ios[sub] = FileIOHelper(p, create_dirs=False)
    g, t = ios["g"], ios["t"]
    check(filecmp.cmp(g.get_encoded_file_name(), t.get_encoded_file_name(),
                      shallow=False),
          f"deliverable (RC3+fastME, exact, {tag}) bitstream == golden")
    rec = np.fromfile(t.get_mc_reconstructed_file_name(), np.uint8)
    dec = np.fromfile(t.get_mc_decoded_file_name(), np.uint8)
    check(np.array_equal(rec, dec),
          f"deliverable ({tag}) decode == encoder recon")
    os.environ.pop("BVC_DEVBITS", None)


def smoke_720p():
    from basic_video_codec_tpu.config import EncoderConfig, InputParameters
    from basic_video_codec_tpu.models.pipeline import decode_video, encode_video
    from basic_video_codec_tpu.tools import ygen

    W, H, N = 1280, 720, 6
    tmp = tempfile.mkdtemp(prefix="bvc_720_")
    ygen.write_y_file(os.path.join(tmp, "s.y"),
                      ygen.moving_sequence(W, H, N, seed=3))
    ec = EncoderConfig(block_size=16, search_range=4, I_Period=6,
                       quantization_factor=6, resolution=(W, H))
    p = InputParameters(os.path.join(tmp, "s.y"), W, H, ec,
                        frames_to_process=N)
    encode_video(p, results_csv_path=None)
    decode_video(p)
    from basic_video_codec_tpu.io.fileio import FileIOHelper

    io = FileIOHelper(p, create_dirs=False)
    rec = np.fromfile(io.get_mc_reconstructed_file_name(), np.uint8)
    dec = np.fromfile(io.get_mc_decoded_file_name(), np.uint8)
    check(np.array_equal(rec, dec), "720p smoke decode == encoder recon")


def batch_lane():
    """Batched-vs-serial on the real chip (VMEM/Mosaic/HLO differ from the
    CPU mesh the tests run on): byte-identity in exact mode, PSNR/bits
    tolerance in float mode."""
    import csv

    from basic_video_codec_tpu.config import EncoderConfig, InputParameters
    from basic_video_codec_tpu.io.fileio import FileIOHelper
    from basic_video_codec_tpu.models.batch import encode_videos_batched
    from basic_video_codec_tpu.models.pipeline import encode_video
    from basic_video_codec_tpu.tools import ygen

    W, H, N = 352, 288, 8
    tmp = tempfile.mkdtemp(prefix="bvc_batch_")
    y = ygen.moving_sequence(W, H, N, seed=13)

    def params(sub, qp, **cfg):
        d = os.path.join(tmp, sub)
        os.makedirs(d, exist_ok=True)
        yp = os.path.join(d, "t.y")
        if not os.path.exists(yp):
            ygen.write_y_file(yp, y)
        base = dict(block_size=16, search_range=2, I_Period=4,
                    quantization_factor=qp, resolution=(W, H))
        base.update(cfg)
        return InputParameters(yp, W, H, EncoderConfig(**base),
                               frames_to_process=N)

    def metrics_rows(p):
        io = FileIOHelper(p, create_dirs=False)
        with open(io.get_metrics_csv_file_name()) as f:
            return list(csv.reader(f))[1:]

    # (a) exact-transform QP group: byte identity
    qps = [3, 6]
    res = encode_videos_batched(
        [params("b_exact", q, exact_transform=True) for q in qps],
        results_csv_path=None)
    check(res.n_batched == 1, "batch lane: exact QP group vmapped")
    for q in qps:
        encode_video(params("s_exact", q, exact_transform=True),
                     results_csv_path=None)
        bio = FileIOHelper(params("b_exact", q, exact_transform=True),
                           create_dirs=False)
        sio = FileIOHelper(params("s_exact", q, exact_transform=True),
                           create_dirs=False)
        for get in ("get_encoded_file_name", "get_mc_reconstructed_file_name",
                    "get_quant_dct_coff_fh_file_name", "get_mv_file_name"):
            check(filecmp.cmp(getattr(bio, get)(), getattr(sio, get)(),
                              shallow=False),
                  f"batch exact qp={q}: {get} byte-identical to serial")

    # (b) mixed-I_Period exact group (the runtime-mode chunk program)
    mixed = [params("b_mixed", 4, I_Period=ip, exact_transform=True)
             for ip in (2, 4)]
    res = encode_videos_batched(mixed, results_csv_path=None)
    check(res.n_batched == 1, "batch lane: mixed-I_Period group vmapped")
    for ip in (2, 4):
        encode_video(params("s_mixed", 4, I_Period=ip, exact_transform=True),
                     results_csv_path=None)
        bio = FileIOHelper(params("b_mixed", 4, I_Period=ip,
                                  exact_transform=True), create_dirs=False)
        sio = FileIOHelper(params("s_mixed", 4, I_Period=ip,
                                  exact_transform=True), create_dirs=False)
        check(filecmp.cmp(bio.get_encoded_file_name(),
                          sio.get_encoded_file_name(), shallow=False),
              f"batch mixed I_Period={ip}: bitstream byte-identical")

    # (b2) round-5 lanes on the real chip: the multiref rolling-stack group
    # and the RC3 fused-two-pass bitrate group (exact mode — RC chains feed
    # row bits back into QP decisions, so byte-identity is pinned under the
    # integer-exact transform, PARITY.md divergence 6)
    mr_cfg = dict(nRefFrames=4, exact_transform=True)
    res = encode_videos_batched(
        [params("b_mr", q, **mr_cfg) for q in qps], results_csv_path=None)
    check(res.n_batched == 1, "batch lane: multiref (nRef=4) group vmapped")
    for q in qps:
        encode_video(params("s_mr", q, **mr_cfg), results_csv_path=None)
        bio = FileIOHelper(params("b_mr", q, **mr_cfg), create_dirs=False)
        sio = FileIOHelper(params("s_mr", q, **mr_cfg), create_dirs=False)
        check(filecmp.cmp(bio.get_encoded_file_name(),
                          sio.get_encoded_file_name(), shallow=False),
              f"batch multiref qp={q}: bitstream byte-identical")
    rc_cfg = dict(RCflag=3, I_Period=8, exact_transform=True)
    brs = (1_200_000, 2_400_000)
    res = encode_videos_batched(
        [params("b_rc", 5, targetBR=br, **rc_cfg) for br in brs],
        results_csv_path=None)
    check(res.n_batched == 1, "batch lane: RC3 two-pass bitrate group vmapped")
    for br in brs:
        encode_video(params("s_rc", 5, targetBR=br, **rc_cfg),
                     results_csv_path=None)
        bio = FileIOHelper(params("b_rc", 5, targetBR=br, **rc_cfg),
                           create_dirs=False)
        sio = FileIOHelper(params("s_rc", 5, targetBR=br, **rc_cfg),
                           create_dirs=False)
        check(filecmp.cmp(bio.get_encoded_file_name(),
                          sio.get_encoded_file_name(), shallow=False),
              f"batch RC3 two-pass targetBR={br}: bitstream byte-identical")

    # (c) float-mode QP group: vmapped float32-DCT HLO is a distinct ±1-edge
    # class (PARITY.md divergence 6) — assert PSNR within 0.2 dB and frame
    # bytes within 2% of the serial run, per frame
    res = encode_videos_batched(
        [params("b_float", q) for q in qps], results_csv_path=None)
    check(res.n_batched == 1, "batch lane: float QP group vmapped")
    for q in qps:
        encode_video(params("s_float", q), results_csv_path=None)
        rb = metrics_rows(params("b_float", q))
        rs = metrics_rows(params("s_float", q))
        check(len(rb) == len(rs) == N, f"batch float qp={q}: row count")
        for fb, fs in zip(rb, rs):
            dpsnr = abs(float(fb[4]) - float(fs[4]))
            dbytes = abs(int(fb[5]) - int(fs[5])) / max(int(fs[5]), 1)
            check(dpsnr <= 0.2 and dbytes <= 0.02,
                  f"batch float qp={q} frame {fb[0]}: PSNR Δ{dpsnr:.3f} dB, "
                  f"bytes Δ{dbytes * 100:.2f}%")
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    fastme_parity()
    fullsearch_parity()
    deliverable_golden(devbits=True)
    deliverable_golden(devbits=False)
    smoke_720p()
    batch_lane()
    print("ALL HARDWARE CHECKS PASSED")
