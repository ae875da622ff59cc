"""Micro-benchmark the device-side pack components (deliverable shapes).

CIF block 16, K=21 vmapped frames — each timed as a data-dependent chain.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H, BLOCK, K = 352, 288, 16, 21


def chain(fn, init, n=32, reps=3, label=""):
    import jax

    out = fn(init)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        x = init
        t0 = time.time()
        for _ in range(n):
            x = fn(x)
        jax.block_until_ready(x)
        best = min(best, time.time() - t0)
    print(f"{label}: {best / n * 1000:.3f} ms/iter", flush=True)
    return best / n


def main():
    logging.disable(logging.INFO)
    import jax
    import jax.numpy as jnp

    from basic_video_codec_tpu.ops import pack as PK

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    nbr, nbc = H // BLOCK, W // BLOCK
    nb = nbr * nbc
    hw = H * W

    qfrac = (3, 4)
    capq = PK.qdct_caps(nb, BLOCK, qfrac)
    cape = PK.esc_cap(H, W)
    capk = PK.jk_cap(H, W, False)

    # sparse-ish qdct plane (~20% nonzero, mostly small values)
    qdct_np = rng.integers(-9, 9, (K, H, W)).astype(np.int16)
    qdct_np[rng.random((K, H, W)) < 0.8] = 0
    qdct = jnp.asarray(qdct_np)
    recon = jnp.asarray(rng.integers(0, 255, (K, H, W)), dtype=jnp.uint8)
    # guesses within +-1 of the plane for realistic code distribution
    guess_r = (recon.astype(jnp.int32)
               + jnp.asarray(rng.integers(-1, 2, (K, H, W)))).astype(jnp.int32)
    art = jnp.asarray(rng.integers(0, 255, (K, H, W)), dtype=jnp.uint8)
    guess_a = (art.astype(jnp.int32)
               + jnp.asarray(rng.integers(-1, 2, (K, H, W)))).astype(jnp.int32)
    row_qps = jnp.asarray(rng.integers(1, 9, (K, nbr)), dtype=jnp.int32)

    # 1. pack_qdct q4 path, vmapped over K
    @jax.jit
    def f_qdct(q):
        out = jax.vmap(lambda p: PK.pack_qdct(p, BLOCK, capq, jnp.int16,
                                              True))(q)
        return q + (out[2].sum() % 3).astype(q.dtype)

    chain(f_qdct, qdct, label=f"pack_qdct q4 (x{K} frames)")

    # 2. exact_x_blocks
    @jax.jit
    def f_x(q):
        x = jax.vmap(lambda p, rq: PK.exact_x_blocks(p, rq, BLOCK))(q, row_qps)
        return q + (x.sum() % 3).astype(q.dtype)

    chain(f_x, qdct, label=f"exact_x_blocks (x{K})")

    # 3. pack_joint
    @jax.jit
    def f_joint(r):
        out = jax.vmap(lambda a, b, c, d: PK.pack_joint(a, b, c, d, cape,
                                                        capk=capk))(
            r, guess_r, art, guess_a)
        return r + (out[2].sum() % 3).astype(r.dtype)

    chain(f_joint, recon, label=f"pack_joint (x{K})")

    # 4. split_bitmap
    jb = jnp.asarray(rng.integers(0, 255, (K, hw // 8)), dtype=jnp.uint8)
    jb = jb * (jnp.asarray(rng.random((K, hw // 8))) < 0.15)

    @jax.jit
    def f_split(b):
        out = jax.vmap(PK.split_bitmap)(b)
        return b + (out[2].sum() % 3).astype(b.dtype)

    chain(f_split, jb, label=f"split_bitmap (x{K})")

    # 5. bare cumsum + scatter over one plane (the primitive)
    mask = jnp.asarray(rng.random((K, hw)) < 0.2)

    @jax.jit
    def f_cumsum(m):
        c = jnp.cumsum(m.astype(jnp.int32), axis=1)
        return m ^ (c[:, -1:] % 2 == 0)

    chain(f_cumsum, mask, label=f"bare cumsum [K={K}, {hw}]")

    vals = jnp.asarray(rng.integers(0, 255, (K, hw)), dtype=jnp.uint8)

    @jax.jit
    def f_scatter(m):
        def one(mk, vk):
            off = jnp.cumsum(mk) - mk
            idx = jnp.where(mk & (off < capq), off, capq)
            return jnp.zeros(capq + 1, jnp.uint8).at[idx].set(vk)[:capq]

        out = jax.vmap(one)(m, vals)
        return m ^ (out.sum() % 2 == 0)

    chain(f_scatter, mask, label=f"cumsum+scatter [K={K}, {hw}] -> {capq}")

    # 6. pack_mv_delta
    mv = jnp.asarray(rng.integers(-7, 8, (K, 2 * nb)), dtype=jnp.int32)

    @jax.jit
    def f_mvd(m):
        out = jax.vmap(PK.pack_mv_delta)(m)
        return m + (out[1].sum() % 3).astype(m.dtype)

    chain(f_mvd, mv, label=f"pack_mv_delta (x{K})")


if __name__ == "__main__":
    main()
