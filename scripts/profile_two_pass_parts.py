"""Decompose the deliverable config's device two-pass chain (ad hoc).

Times, as data-dependent chains on the real chip:
  1. the fastME Pallas walk alone,
  2. the pricing pipeline (zigzag selector matmul + RLE bits) x2 passes,
  3. reconstruct_mode (the exact-IDCT recon),
  4. the full two-pass chunk at compact=False (no packers),
  5. the full two-pass chunk compact+tail (the product path),
  6. intra_encode_frame chained (the I-frame wavefront).
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H, BLOCK, QP, IPERIOD, TARGET_BR = 352, 288, 16, 5, 21, 2_400_000
N = 84


def chain(fn, init, n, reps=3, label=""):
    """Time fn chained n times with a data dependency, best of reps."""
    import jax

    out = fn(init)  # compile
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        x = init
        t0 = time.time()
        for _ in range(n):
            x = fn(x)
        jax.block_until_ready(x)
        best = min(best, time.time() - t0)
    print(f"{label}: {best / n * 1000:.2f} ms/iter ({n} iters)", flush=True)
    return best / n


def main():
    logging.disable(logging.INFO)
    import jax
    import jax.numpy as jnp

    from basic_video_codec_tpu.config import EncoderConfig
    from basic_video_codec_tpu.golden.encoder import _load_rc_table
    from basic_video_codec_tpu.models.pipeline import _prev_avg_qp, _table_arrays
    from basic_video_codec_tpu.models.two_pass import encode_chunk_two_pass
    from basic_video_codec_tpu.ops import bitlen
    from basic_video_codec_tpu.ops import pack as PK
    from basic_video_codec_tpu.ops import transform as T
    from basic_video_codec_tpu.ops.fastme import fast_search_frame
    from basic_video_codec_tpu.ops.intra import intra_encode_frame
    from basic_video_codec_tpu.rc.rate_control import bit_budget_per_frame
    from basic_video_codec_tpu.tools import ygen

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    frames = ygen.moving_sequence(W, H, N, seed=42)
    nbr, nbc = H // BLOCK, W // BLOCK
    nb = nbr * nbc

    ec = EncoderConfig(BLOCK, 1, IPERIOD, QP, resolution=(W, H),
                       fastME=True, RCflag=3, targetBR=TARGET_BR)
    ec.validate()
    _load_rc_table(ec)
    tbl_np = _table_arrays(ec)
    tbl = (jnp.asarray(tbl_np[0]), jnp.asarray(tbl_np[1]))
    budget0 = jnp.float32(bit_budget_per_frame(ec))
    initial_qp = jnp.int32(QP)
    exp_p_frame = jnp.float32(ec.rc_lookup_table[QP]["P"] * nbr)
    q4 = PK.qdct_nibble_safe(ec)
    qfrac = PK.qcap_fraction(ec)

    curr = jnp.asarray(frames[1])
    gray = jnp.full((H, W), 128, jnp.uint8)
    refs1 = gray[None]
    hp1 = jnp.zeros((1, 2 * H, 2 * W), jnp.uint8)

    # 1. fastME walk alone, chained on the ref
    @jax.jit
    def me_step(r):
        mvs, sads, comps = fast_search_frame(curr, r, hp1, BLOCK, False)
        # cheap data dependency: fold the mv field back into the ref
        return (r + sads.sum().astype(jnp.uint8)).astype(jnp.uint8)

    chain(me_step, refs1, 64, label="1. fastME Pallas walk")

    # 2. pricing x2: quantize + zigzag + rle bits, twice
    qmats = jnp.asarray(T.quant_matrices(BLOCK))
    coeffs0 = jnp.asarray(
        np.random.default_rng(0).integers(-800, 800, (nbr, nbc, BLOCK, BLOCK))
    ).astype(jnp.float32)

    @jax.jit
    def price2_step(c):
        def price(qp_rows):
            Qr = qmats[qp_rows][:, None]
            q = T.quantize(c, Qr)
            zz = bitlen.zigzag_rows(q.reshape(nbr, nbc, BLOCK * BLOCK), BLOCK)
            return bitlen.rle_block_bits(zz).sum(axis=1), q

        rb1, _ = price(jnp.full(nbr, 6, jnp.int32))
        qp2 = jnp.clip(rb1 % 7, 1, 8).astype(jnp.int32)
        rb2, q2 = price(qp2)
        return c + (rb2.sum() % 3).astype(jnp.float32)

    chain(price2_step, coeffs0, 64, label="2. price x2 (quant+zz+rle)")

    # 3. reconstruct_mode (exact recon + art)
    preds0 = jnp.asarray(
        np.random.default_rng(1).integers(0, 255, (nbr, nbc, BLOCK, BLOCK))
    ).astype(jnp.int32)

    @jax.jit
    def recon_step(q):
        rb, ir = T.reconstruct_mode(q, qmats[jnp.full(nbr, 6, jnp.int32)][:, None],
                                    preds0, BLOCK, False)
        return q + (ir.sum() % 3).astype(q.dtype)

    q0 = jnp.asarray(
        np.random.default_rng(2).integers(-50, 50, (nbr, nbc, BLOCK, BLOCK))
    ).astype(jnp.float32)
    chain(recon_step, q0, 64, label="3. reconstruct_mode")

    # 6. intra wavefront chained
    @jax.jit
    def intra_step(c):
        recon, hp2, art, qdct, smalls = intra_encode_frame(
            c, jnp.full(nbr, 6, jnp.int32), jnp.float32(0),
            jnp.zeros_like(tbl[0]), jnp.zeros_like(tbl[1]), initial_qp,
            BLOCK, False, emit_halfpel=False)
        return recon

    chain(intra_step, curr, 32, label="6. intra wavefront (1 pass)")

    # 4/5. the full two-pass chunk, compact off/on
    def run_chunks(compact, tail, label):
        def dispatch(frames_np):
            ref = jnp.zeros((1, H, W), jnp.uint8).at[0].set(gray)
            hp = jnp.zeros((1, 2 * H, 2 * W), jnp.uint8)
            nv = jnp.int32(1)
            prev_avg = jnp.int32(_prev_avg_qp([QP], ec))
            n = 0
            while n < len(frames_np):
                k = min(24, IPERIOD - n % IPERIOD, len(frames_np) - n)
                c = jnp.asarray(frames_np[n : n + k])
                dev, ref, hp, nv, prev_avg = encode_chunk_two_pass(
                    c, ref, hp, nv, prev_avg, budget0, tbl[0], tbl[1],
                    exp_p_frame, initial_qp, BLOCK, 0, True, False,
                    n % IPERIOD == 0, compact=compact, int8q=False,
                    mv8=False, q4=q4 and compact, tail=tail, qfrac=qfrac)
                n += k
            return ref

        ref = run = dispatch(frames[:42])
        ref.block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            ref = dispatch(frames)
            ref.block_until_ready()
            best = min(best, time.time() - t0)
        print(f"{label}: {best / N * 1000:.2f} ms/frame = {N / best:.1f} fps",
              flush=True)

    run_chunks(False, False, "4. two-pass chunk, compact=False")
    run_chunks(True, True, "5. two-pass chunk, compact+tail")


if __name__ == "__main__":
    main()
