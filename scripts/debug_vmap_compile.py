"""Diagnose the batched-lane compile blowup: lower the vmapped chunk
program at several batch widths C and report StableHLO text size and
(optionally) compile wall time.  If the HLO grows ~linearly with C,
some op in the chunk program has no real batching rule and is being
unrolled over the config axis — that's the op to fix.

Runs on the CPU backend (no TPU needed):

    python scripts/debug_vmap_compile.py [--compile]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--compile", action="store_true",
                    help="also time backend compilation per C")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--mixed", action="store_true",
                    help="use the runtime-mode (mixed I_Period) lane")
    args = ap.parse_args()

    from basic_video_codec_tpu.models.chunk import (encode_chunk,
                                                    encode_chunk_mixed)
    from basic_video_codec_tpu.ops import pack as PK

    W, H, bs, r = 176, 144, args.bs, 2
    k = args.frames
    layout = PK.FrameLayout(H, W, bs, 2, True, True, False, False,
                            False, tail=True, mvk=2, mvn=True,
                            qfrac=(3, 8))
    qfrac = (3, 8)

    if args.mixed:
        def one(frames, ref, hp, is_i, row_qps, iqp, budget0, tblq, tblb):
            return encode_chunk_mixed(
                frames, ref, hp, is_i, row_qps, budget0, tblq, tblb, iqp,
                bs, r, False, False, False, exact=False, compact=True,
                int8q=False, mv8=False, q4=False, tail=True,
                packed_shape=None, qfrac=qfrac)
    else:
        def one(frames, ref, hp, is_i, row_qps, iqp, budget0, tblq, tblb):
            return encode_chunk(
                frames, ref, hp, row_qps, budget0, tblq, tblb, iqp, bs,
                r, False, False, False, True, exact=False, compact=True,
                int8q=False, mv8=False, q4=False, tail=True,
                packed_shape=None, qfrac=qfrac)

    nbr = H // bs

    def shaped(C):
        frames = jax.ShapeDtypeStruct((k, H, W), jnp.uint8)
        ref = jax.ShapeDtypeStruct((C, H, W), jnp.uint8)
        hp = jax.ShapeDtypeStruct((C, 2 * H, 2 * W), jnp.uint8)
        is_i = jax.ShapeDtypeStruct((C, k), jnp.bool_)
        row_qps = jax.ShapeDtypeStruct((C, nbr), jnp.int32)
        iqp = jax.ShapeDtypeStruct((C,), jnp.int32)
        budget0 = jax.ShapeDtypeStruct((), jnp.float32)
        tblq = jax.ShapeDtypeStruct((12,), jnp.int32)
        tblb = jax.ShapeDtypeStruct((12,), jnp.float32)
        return frames, ref, hp, is_i, row_qps, iqp, budget0, tblq, tblb

    for C in (1, 2, 4, 8):
        vm = jax.vmap(one, in_axes=(None, 0, 0, 0, 0, 0, None, None, None))
        fn = jax.jit(vm)
        t0 = time.time()
        lowered = fn.lower(*shaped(C))
        t_low = time.time() - t0
        txt = lowered.as_text()
        line = (f"C={C}: stablehlo {len(txt) / 1e6:7.2f} MB, "
                f"{txt.count(chr(10)):8d} lines, lower {t_low:6.1f}s")
        if args.compile:
            t0 = time.time()
            lowered.compile()
            line += f", compile {time.time() - t0:6.1f}s"
        print(line, flush=True)


if __name__ == "__main__":
    main()
