"""Find a faster device-side stream compaction (the packer's primitive).

All variants amortize the relay dispatch floor by running REP chained
repetitions inside one jit, and defeat the relay result cache by folding
the full output back into the carry.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

W, H, K = 352, 288, 21
HW = W * H
REP = 8


def bench(jit_fn, init, n=8, reps=3, label=""):
    import jax

    out = jit_fn(init)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        x = init
        t0 = time.time()
        for _ in range(n):
            x = jit_fn(x)
        jax.block_until_ready(x)
        best = min(best, time.time() - t0)
    per = best / n / REP / K * 1000
    print(f"{label}: {per:.4f} ms/frame-op", flush=True)
    return per


def main():
    logging.disable(logging.INFO)
    import jax
    import jax.numpy as jnp

    print(f"platform: {jax.devices()[0].platform}", flush=True)
    rng = np.random.default_rng(0)
    cap = HW * 3 // 4

    mask0 = jnp.asarray(rng.random((K, HW)) < 0.2)
    vals0 = jnp.asarray(rng.integers(1, 255, (K, HW)), dtype=jnp.uint8)

    def rep(f):
        def wrapped(m):
            for _ in range(REP):
                m = f(m)
            return m
        return jax.jit(wrapped)

    # A. cumsum alone
    def a(m):
        c = jnp.cumsum(m.astype(jnp.int32), axis=1)
        return m ^ ((c & 1) == 0)

    bench(rep(a), mask0, label="A. cumsum int32 [K,101k]")

    # B. scatter alone (precomputed static-ish indices, data-dep values)
    idx0 = jnp.asarray(
        np.sort(rng.integers(0, cap, (K, HW)).astype(np.int32), axis=1))

    def b(m):
        def one(mk, vk, ik):
            return jnp.zeros(cap + 1, jnp.uint8).at[ik].set(vk)[:cap]

        out = jax.vmap(one)(m, vals0 ^ m.astype(jnp.uint8), idx0)
        return m ^ ((out[:, :HW // 2].repeat(2, axis=1) & 1) == 0)

    bench(rep(b), mask0, label="B. scatter-only 101k -> 76k")

    # C. full cumsum+scatter compaction (the current primitive)
    def c(m):
        def one(mk, vk):
            off = jnp.cumsum(mk.astype(jnp.int32)) - mk
            idx = jnp.where(mk & (off < cap), off, cap)
            return jnp.zeros(cap + 1, jnp.uint8).at[idx].set(vk)[:cap]

        out = jax.vmap(one)(m, vals0)
        return m ^ ((out[:, :HW // 2].repeat(2, axis=1) & 1) == 0)

    bench(rep(c), mask0, label="C. cumsum+scatter compaction")

    # D. matmul cumsum: [K, HW] -> [K, n_chunks, 128] triangular matmul
    tri = jnp.asarray(np.triu(np.ones((128, 128), np.float32)))

    def mat_cumsum(m):
        x = m.astype(jnp.float32).reshape(K, HW // 128, 128)
        within = jax.lax.dot_general(
            x, tri, (((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # [K, C, 128] inclusive
        chunk_tot = within[..., -1]               # [K, C]
        C = chunk_tot.shape[1]
        tri2 = jnp.asarray(np.triu(np.ones((C, C), np.float32), 1).T)
        carry = jax.lax.dot_general(
            chunk_tot, tri2, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)  # exclusive over chunks
        return (within + carry[..., None]).reshape(K, HW)

    def d(m):
        cs = mat_cumsum(m)
        return m ^ ((cs.astype(jnp.int32) & 1) == 0)

    bench(rep(d), mask0, label="D. matmul cumsum")

    # E. matmul-cumsum + scatter compaction
    def e(m):
        cs = mat_cumsum(m).astype(jnp.int32)

        def one(mk, vk, ck):
            off = ck - mk
            idx = jnp.where(mk & (off < cap), off, cap)
            return jnp.zeros(cap + 1, jnp.uint8).at[idx].set(vk)[:cap]

        out = jax.vmap(one)(m, vals0, cs)
        return m ^ ((out[:, :HW // 2].repeat(2, axis=1) & 1) == 0)

    bench(rep(e), mask0, label="E. matmul-cumsum + scatter")

    # F. sort-based compaction: stable sort by (!mask), values follow
    def f(m):
        key = (~m).astype(jnp.int32)
        _, v = jax.lax.sort((key, vals0), dimension=1, is_stable=True,
                            num_keys=1)
        out = v[:, :cap]
        return m ^ ((out[:, :HW // 2].repeat(2, axis=1) & 1) == 0)

    bench(rep(f), mask0, label="F. sort-based compaction")

    # G. smaller source: compaction over 32k elements (tail-pool scale)
    small = 32768
    ms0 = jnp.asarray(rng.random((K, small)) < 0.2)
    vs0 = jnp.asarray(rng.integers(1, 255, (K, small)), dtype=jnp.uint8)

    def g(m):
        def one(mk, vk):
            off = jnp.cumsum(mk.astype(jnp.int32)) - mk
            idx = jnp.where(mk & (off < cap), off, cap)
            return jnp.zeros(cap + 1, jnp.uint8).at[idx].set(vk)[:cap]

        out = jax.vmap(one)(m, vs0)
        return m ^ ((out[:, :small // 2].repeat(2, axis=1) & 1) == 0)

    bench(rep(g), ms0, label="G. cumsum+scatter over 32k")


if __name__ == "__main__":
    main()
