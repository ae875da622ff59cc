"""Device-chain decomposition on the real TPU: where the ~6 ms/frame goes.

Times, as data-dependent chains (relay-cache-proof, CLAUDE.md):
  (1) the production chunk program (compact+tail+q4, packed uploads),
  (2) the same chunk scan-only (compact=False) -> packing = (1) - (2),
  (3) micro-ops of the packing epilogue batched over K frames: zigzag
      selector matmul, exact-IDCT einsum, full-plane cumsum, full-plane
      scatter, pack_qdct, pack_joint,
  (4) micro-ops of the scan body: ME, forward DCT+quantize, pricing,
      reconstruct.

Usage: python scripts/profile_device.py [--frames N] [--chunk K] [--section S]

--section limits which measurements run (comma list of 1-5, default all).
Section 5 (in-scan decomposition) should run ALONE in a fresh process:
the full-plane scatter micro-ops in section 3 leave the backend in the
documented degraded-gather mode (PROFILE.md §4) and pollute everything
after them.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H = 352, 288
BLOCK, R, QP, IPERIOD = 8, 2, 5, 10


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--chunk", type=int, default=10)
    ap.add_argument("--section", default="1,2,3,4,5")
    args = ap.parse_args()
    sections = {int(s) for s in args.section.split(",")}

    import jax
    import jax.numpy as jnp

    from basic_video_codec_tpu.models.chunk import encode_chunk
    from basic_video_codec_tpu.models.pframe import pframe_encode
    from basic_video_codec_tpu.ops import bitlen
    from basic_video_codec_tpu.ops import pack as P
    from basic_video_codec_tpu.ops import transform as T
    from basic_video_codec_tpu.tools import ygen

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    frames = ygen.moving_sequence(W, H, args.frames, seed=42)
    K = args.chunk

    row_qps = jnp.full(H // BLOCK, QP, jnp.int32)
    budget0 = jnp.float32(0)
    tblq = jnp.zeros(1, jnp.int32)
    tblb = jnp.zeros(1, jnp.float32)
    iqp = jnp.int32(QP)
    nbr, nbc = H // BLOCK, W // BLOCK
    nb = nbr * nbc
    L = BLOCK * BLOCK

    def run_chunks(compact):
        ref = jnp.full((H, W), 128, jnp.uint8)
        hp = jnp.zeros((2 * H, 2 * W), jnp.uint8)
        outs = []
        n = 0
        while n < len(frames):
            pos = n % IPERIOD
            k = min(K, IPERIOD - pos, len(frames) - n)
            c = jnp.asarray(frames[n : n + k])
            dev = encode_chunk(c, ref, hp, row_qps, budget0, tblq, tblb, iqp,
                               BLOCK, R, False, False, False, pos == 0,
                               compact=compact, q4=compact, tail=compact)
            ref, hp = dev[2], dev[3]
            outs.append(dev)
            n += k
        return outs, ref

    if sections & {1, 2}:
        # warmup both variants
        t0 = time.time()
        for compact in (False, True):
            outs, ref = run_chunks(compact)
            np.asarray(ref)
        print(f"warmup: {time.time() - t0:.1f}s", flush=True)

        for name, compact in (("scan-only ", False), ("production", True)):
            best = 1e9
            for rep in range(3):
                t0 = time.time()
                outs, ref = run_chunks(compact)
                ref.block_until_ready()
                best = min(best, time.time() - t0)
            print(f"(1/2) {name} chunk chain: {best:.3f}s "
                  f"= {best / args.frames * 1e3:.2f} ms/frame", flush=True)

    if not sections & {3, 4}:
        if 5 in sections:
            _section5(args, jax, jnp, frames, K, row_qps, nbr, nbc, L)
        if 6 in sections:
            _section6(args, jax, jnp, frames, K, row_qps)
        return

    # --- stacked inputs for micro-ops: one chunk's worth of real data
    outs, _ = run_chunks(False)
    intra_out, p_out = outs[0][0], outs[0][1]
    recons, arts, qdcts, smalls = (jnp.asarray(x) for x in p_out)
    Kp = int(recons.shape[0])
    preds = recons  # stand-in prediction plane (same shape/dtype)
    rq = jnp.tile(row_qps[None], (Kp, 1))
    layout = P.FrameLayout(H, W, BLOCK, 2, True, True, False, True, True,
                           tail=True, mvk=2)

    def timeit(name, fn, x0, n=30):
        """Chained micro-benchmark: fold each rep's output back into the
        input so the relay cannot serve cached results."""
        x = x0
        out = fn(x, 0)
        jax.block_until_ready(out)
        t0 = time.time()
        for i in range(n):
            out = fn(x, i)
            x = x0  # inputs themselves static; fn must fold i in
        jax.block_until_ready(out)
        dt = (time.time() - t0) / n
        print(f"  {name:34s} {dt / Kp * 1e3:7.3f} ms/frame "
              f"({dt * 1e3:.2f} ms/chunk of {Kp})", flush=True)
        return dt

    print(f"(3) packing micro-ops, batched over K={Kp}:", flush=True)
    zz = jax.jit(jax.vmap(lambda q: bitlen.zigzag_rows(
        q.reshape(nbr, BLOCK, nbc, BLOCK).transpose(0, 2, 1, 3)
        .reshape(nb, L).astype(jnp.int32), BLOCK)))
    timeit("zigzag selector matmul", lambda x, i: zz(qdcts + i), qdcts)

    xb = jax.jit(jax.vmap(lambda q, r: P.exact_x_blocks(q.astype(jnp.int32), r, BLOCK)))
    timeit("exact-IDCT einsum (x blocks)", lambda x, i: xb(qdcts + i, rq), qdcts)

    flat = (qdcts.astype(jnp.int32) != 0).reshape(Kp, -1).astype(jnp.int32)
    cs = jax.jit(jax.vmap(jnp.cumsum))
    timeit("full-plane cumsum (101k i32)", lambda x, i: cs(flat + i), flat)

    cap = layout.capq
    idx0 = jnp.tile(jnp.arange(H * W, dtype=jnp.int32)[None] % cap, (Kp, 1))
    vals0 = qdcts.reshape(Kp, -1)
    sc = jax.jit(jax.vmap(lambda ix, v: jnp.zeros(cap + 1, jnp.int16)
                          .at[ix].set(v)[:cap]))
    timeit("full-plane scatter (101k->cap)",
           lambda x, i: sc((idx0 + i) % cap, vals0), idx0)

    pq = jax.jit(jax.vmap(lambda q: P.pack_qdct(q, BLOCK, cap, jnp.int16, True)))
    timeit("pack_qdct (q4)", lambda x, i: pq(qdcts + i), qdcts)

    def pj(recon, qdct, pred, r):
        x = P.exact_x_blocks(qdct.astype(jnp.int32), r, BLOCK)
        guess = P.recon_guess_from_x(x, pred.astype(jnp.int32), BLOCK)
        return P.pack_joint(recon, guess, recon, P.art_guess_from_x(x),
                            layout.cape, tight=True, capk=layout.capk)
    pjv = jax.jit(jax.vmap(pj, in_axes=(0, 0, 0, 0)))
    timeit("exact_x+guesses+pack_joint",
           lambda x, i: pjv(recons, qdcts + i, preds, rq), qdcts)

    print(f"(4) scan-body micro-ops, batched over K={Kp}:", flush=True)
    ref1 = recons[:1]
    hp1 = jnp.zeros((1, 2 * H, 2 * W), jnp.uint8)

    def pf(curr, i):
        out = pframe_encode(curr + (i % 2).astype(jnp.uint8), ref1, (),
                            row_qps, budget0, tblq, tblb, iqp, BLOCK, R,
                            False, False, False, False)
        return out[0]
    pfv = jax.jit(jax.vmap(pf, in_axes=(0, None)))
    timeit("pframe_encode (vmapped, 1 ref)",
           lambda x, i: pfv(recons, jnp.int32(i)), recons)

    from basic_video_codec_tpu.ops.pallas_me import full_search_pallas, use_pallas
    if use_pallas(H, W, BLOCK, R, 1, False):
        me = jax.jit(lambda c, r: full_search_pallas(c, r[None], hp1[0][None],
                                                     BLOCK, R, False)[0])
        x0 = recons[0]
        t0 = time.time()
        out = me(x0, recons[1])
        jax.block_until_ready(out)
        t0 = time.time()
        n = 30
        for i in range(n):
            out = me(recons[i % Kp], recons[(i + 1) % Kp])
        jax.block_until_ready(out)
        print(f"  {'pallas full-search ME (1 frame)':34s} "
              f"{(time.time() - t0) / n * 1e3:7.3f} ms/frame", flush=True)

    def dctq(curr, pred):
        res = curr.reshape(nbr, BLOCK, nbc, BLOCK).transpose(0, 2, 1, 3)\
                  .astype(jnp.int32) - pred.reshape(nbr, BLOCK, nbc, BLOCK)\
                  .transpose(0, 2, 1, 3).astype(jnp.int32)
        co = T.forward_coeffs(res, BLOCK, False)
        qm = jnp.asarray(T.quant_matrices(BLOCK))[row_qps][:, None]
        return T.quantize(co, qm)
    dq = jax.jit(jax.vmap(dctq, in_axes=(0, 0)))
    timeit("forward DCT + quantize", lambda x, i: dq(recons + i, preds), recons)

    def price(q):
        zzr = bitlen.zigzag_rows(q.reshape(nbr, BLOCK, nbc, BLOCK)
                                 .transpose(0, 2, 1, 3)
                                 .reshape(nbr, nbc, L).astype(jnp.float32), BLOCK)
        return bitlen.rle_block_bits(zzr).sum(axis=1)
    pr = jax.jit(jax.vmap(price))
    timeit("pricing (zigzag+rle bits)", lambda x, i: pr(qdcts + i), qdcts)

    def recon_fn(q, pred):
        qb = q.reshape(nbr, BLOCK, nbc, BLOCK).transpose(0, 2, 1, 3)
        Qr = jnp.asarray(T.quant_matrices(BLOCK))[row_qps][:, None]
        rb, ir = T.reconstruct_mode(qb, Qr, pred.reshape(
            nbr, BLOCK, nbc, BLOCK).transpose(0, 2, 1, 3).astype(jnp.int32),
            BLOCK, False)
        return rb
    rc = jax.jit(jax.vmap(recon_fn, in_axes=(0, 0)))
    timeit("rescale+IDCT+reconstruct", lambda x, i: rc(qdcts + i, preds), qdcts)

    if 5 in sections:
        _section5(args, jax, jnp, frames, K, row_qps, nbr, nbc, L)


def _section6(args, jax, jnp, frames, K, row_qps):
    # (6) intra vs pure-P split of the production chunk chain.  Run alone
    # in a fresh process (same pollution caveat as section 5).
    print("(6) intra / pure-P split of the production chain:", flush=True)
    from basic_video_codec_tpu.models.chunk import encode_chunk
    from basic_video_codec_tpu.ops.intra import intra_encode_frame

    budget0 = jnp.float32(0)
    tblq = jnp.zeros(1, jnp.int32)
    tblb = jnp.zeros(1, jnp.float32)
    iqp = jnp.int32(QP)

    # (a) intra_encode_frame alone, chained through the recon output
    @jax.jit
    def intra_chain(curr):
        recon, _, art, qdct, smalls = intra_encode_frame(
            curr, row_qps, budget0, tblq, tblb, iqp, BLOCK, False)
        return recon
    x = jnp.asarray(frames[0])
    out = intra_chain(x)
    jax.block_until_ready(out)
    best = 1e9
    n = 12
    for rep in range(3):
        t0 = time.time()
        y = jnp.asarray(frames[rep])
        for i in range(n):
            y = intra_chain(y)
        jax.block_until_ready(y)
        best = min(best, time.time() - t0)
    print(f"  intra_encode_frame (chained)      {best / n * 1e3:6.2f} "
          f"ms/frame", flush=True)

    # (b) production chunk, first_is_intra=False for every chunk (pure P)
    def run_chunks(first_intra_first_chunk):
        ref = jnp.full((H, W), 128, jnp.uint8)
        hp = jnp.zeros((2 * H, 2 * W), jnp.uint8)
        n = 0
        while n < len(frames):
            pos = n % IPERIOD
            k = min(K, IPERIOD - pos, len(frames) - n)
            c = jnp.asarray(frames[n : n + k])
            dev = encode_chunk(c, ref, hp, row_qps, budget0, tblq, tblb,
                               iqp, BLOCK, R, False, False, False,
                               first_intra_first_chunk and pos == 0,
                               compact=True, q4=True, tail=True)
            ref, hp = dev[2], dev[3]
            n += k
        return ref

    for name, fi in (("pure-P production chunks", False),
                     ("production chunks (I+P)", True)):
        ref = run_chunks(fi)
        jax.block_until_ready(ref)
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            ref = run_chunks(fi)
            ref.block_until_ready()
            best = min(best, time.time() - t0)
        print(f"  {name:34s}{best / len(frames) * 1e3:6.2f} ms/frame",
              flush=True)


def _section5(args, jax, jnp, frames, K, row_qps, nbr, nbc, L):
    # (5) IN-SCAN cumulative decomposition: the chunk scan is sequential
    # (recon carry), so per-stage costs inside it differ from the batched
    # micro-ops above.  Each level adds one stage; successive differences
    # give the in-scan cost.  Run with --section 5 in a FRESH process —
    # section 3's full-plane scatters poison later gather timings.
    print("(5) in-scan cumulative stages (recon-carried scan):", flush=True)
    from basic_video_codec_tpu.ops import bitlen
    from basic_video_codec_tpu.ops import transform as T
    from basic_video_codec_tpu.ops.pallas_me import full_search_pallas

    qmats = jnp.asarray(T.quant_matrices(BLOCK))

    def make_scan(level):
        @jax.jit
        def run(chunk, ref0):
            hp0 = jnp.zeros((2 * H, 2 * W), jnp.uint8)

            def step(ref, curr):
                if level == 0:
                    return curr, curr.astype(jnp.int32).sum()
                mvs, sads, preds = full_search_pallas(
                    curr, ref[None], hp0[None], BLOCK, R, False)
                preds = preds.astype(jnp.int32)
                if level == 1:
                    return curr, sads.sum() + preds.sum()
                cb = curr.reshape(nbr, BLOCK, nbc, BLOCK)\
                         .transpose(0, 2, 1, 3).astype(jnp.int32)
                co = T.forward_coeffs(cb - preds, BLOCK, False)
                q = T.quantize(co, qmats[row_qps][:, None])
                qrows = q.astype(jnp.int16)
                if level == 2:
                    return curr, qrows.astype(jnp.int32).sum()
                zzr = bitlen.zigzag_rows(q.reshape(nbr, nbc, L), BLOCK)
                bits = bitlen.rle_block_bits(zzr).sum()
                if level == 3:
                    return curr, bits + qrows.astype(jnp.int32).sum()
                rb, _ = T.reconstruct_mode(qrows, qmats[row_qps][:, None],
                                           preds, BLOCK, False)
                recon = rb.transpose(0, 2, 1, 3).reshape(H, W)\
                          .astype(jnp.uint8)
                return recon, bits
            ref, outs = jax.lax.scan(step, ref0, chunk)
            return ref, outs
        return run

    names = ["scan floor (carry only)", "+ pallas full-search ME",
             "+ DCT + quantize", "+ pricing", "+ reconstruct (true carry)"]
    prev = None
    for lvl in range(5):
        run = make_scan(lvl)
        ref = jnp.asarray(frames[0])
        out = run(jnp.asarray(frames[:K]), ref)
        jax.block_until_ready(out)
        best = 1e9
        for rep in range(3):
            t0 = time.time()
            ref = jnp.asarray(frames[rep % 3])
            for n in range(0, len(frames) // K * K, K):
                ref, _ = run(jnp.asarray(frames[n : n + K]), ref)
            jax.block_until_ready(ref)
            best = min(best, time.time() - t0)
        nfr = len(frames) // K * K
        ms = best / nfr * 1e3
        d = f" (+{ms - prev:.2f})" if prev is not None else ""
        print(f"  L{lvl} {names[lvl]:32s} {ms:6.2f} ms/frame{d}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
