"""Batched multi-config encode: N same-shape configs per device program.

The reference's experiment drivers sweep configs serially — the assign1 RD
sweep loops (block size, I_Period, QP) cells and pays a full encode per cell
(/root/reference/assign1/ex4_plots.py:131-257).  On this pipeline each cell
is transfer/host-bound while the chip idles, so the cheapest large
multiplier on aggregate throughput is batching: configs that share every
shape-determining knob (resolution, block size, search, features)
are vmapped into ONE chunk program.  Batched axes:

* **QP sweep** (same input stream): the frames upload once per chunk
  (``in_axes=None``) and every config's outputs come back in one batched
  fetch round — the RD-sweep/ablation drivers' case.
* **I_Period** rides per-frame traced intra flags (the runtime-mode
  chunk program) for single-reference fixed-QP groups.
* **Target bitrate**: RC1's ``budget0`` and the RC2/3 fused two-pass
  scalars (budget, scene statistic, prev-avg-QP seed) are per-config
  values — the rc-compare grid's case.
* **Multi-stream serving** (different ``y_only_file``s, same shapes): each
  config carries its own frame batch (``in_axes=0``) — N independent
  sequences encode concurrently on one chip, with per-stream packed
  uploads (the pack buffer is fixed-size, so streams stack).

Batching pays where per-run pipeline fill/drain dominates — the
reference drivers' 10-21-frame cells, measured 1.54x (PROFILE.md §12).
Long runs measured faster as sequential serial passes (wire/host-bound
either way; §12b/12c), so groups beyond BATCH_MAX_FRAMES route serial.

The batch lane reuses the serial pipeline's machinery end-to-end: the same
chunk programs (models/chunk.py) under ``jax.vmap``, the same compact
transport (ops/pack.py FrameLayout, conservatively sized across the group's
QPs — transport sizing never changes artifact bytes), the same host rebuild
/ finalize (models/pipeline.py), and the same artifact writer
(pipeline._EncodeSink), so each config's artifact tree matches a serial
``encode_video`` run (asserted in tests/test_batch.py; the only permitted
divergence class is the documented float-DCT ±1 edge, ops/transform.py —
batched matmul HLO may round edge coefficients differently).

Eligibility: every tpu-backend config (any RCflag, any nRefFrames — the
sweep/ablation/rc-compare drivers' shapes).  nRefFrames > 1 groups ride the
rolling-stack chunk program (models/chunk.encode_chunk_multiref) vmapped
over configs; RC 2/3 groups vmap the fused two-pass program
(models/two_pass.py); both pin I_Period within a group (no runtime-GOP
variant exists for either).  Golden-backend and parallel-GOP runs fall
back to serial ``encode_video``.
"""

import os
import time
from collections import deque
from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import InputParameters
from ..golden.encoder import _append_throughput, _load_rc_table
from ..rc.rate_control import bit_budget_per_frame
from ..ops import pack as PK
from ..utils.frame_utils import pad_frame, padded_dims
from ..utils.logger import get_logger
from .chunk import (encode_chunk, encode_chunk_intra_only, encode_chunk_mixed,
                    encode_chunk_multiref)
from .pipeline import (DEPTH, INTER, INTRA, MAX_CHUNK, _bucket, _EncodeSink,
                       _finalize_compact, _ReconRebuilder, _stage,
                       _table_arrays, _two_pass_seed_scalars)
from .two_pass import encode_chunk_two_pass

logger = get_logger()


def _group_key(params: InputParameters):
    """Configs in one batch group must agree on everything that shapes the
    device program or the chunk schedule; QP, I_Period and the INPUT STREAM
    are the batched axes:

    * different QPs ride per-config row-QP vectors,
    * different I_Periods ride per-frame traced intra flags — a group with
      mixed GOP structures uses the runtime-mode chunk program
      (models/chunk.encode_chunk_mixed) whose chunks also stop being capped
      at one GOP,
    * different ``y_only_file``s are the multi-stream serving case
      (N independent sequences per chip), uploaded with ``in_axes=0``
      instead of a shared broadcast,
    * different target bitrates (RC1) ride a batched ``budget0``.

    nRefFrames and RCflag shape the program (reference-stack rank R, the
    rc1 budget chain / the fused two-pass program and their transport
    statics), so they live in the key; multiref and two-pass groups
    additionally pin I_Period — neither has a runtime-GOP (mixed)
    variant."""
    ec = params.encoder_config
    key = (params.width, params.height,
           params.frames_to_process, ec.block_size, ec.search_range,
           bool(ec.fastME), bool(ec.fracMeEnabled),
           bool(getattr(ec, "exact_transform", False)),
           ec.nRefFrames, ec.RCflag)
    if ec.nRefFrames > 1 or ec.RCflag > 1:
        key += (ec.I_Period,)
    if ec.RCflag:
        # the device QP chain prices with ONE table per group
        # (_table_arrays(ec0)), so table identity must be part of the key:
        # a caller-supplied calibration table (rc.lookup.generate_rc_lookup;
        # _load_rc_table keeps it) must never share a group with a config
        # on a different table.  None means the shipped CSVs for this
        # (resolution, bs) — identical across the group by the shape key.
        tbl = getattr(ec, "rc_lookup_table", None)
        key += (None if tbl is None else
                tuple(sorted((qp, tuple(sorted(v.items())))
                             for qp, v in tbl.items())),)
    return key


def _batchable(params: InputParameters) -> bool:
    ec = params.encoder_config
    return (getattr(ec, "backend", "auto") != "golden"
            and getattr(ec, "parallel_gops", 0) <= 1)


class BatchEncodeResult:
    """``n_batched`` groups actually vmapped; ``elapsed[i]`` is run i's
    attributed wall time (its group's wall / group size for batched runs —
    the honest amortized per-config cost — or the real serial time)."""

    def __init__(self, n_batched: int, elapsed: list):
        self.n_batched = n_batched
        self.elapsed = elapsed


# Groups batch only when runs are short enough that per-run pipeline
# fill/drain dominates a serial loop (~0.16 s/run: first-chunk fetch
# latency + final drain) — the reference's sweep/ablation/rc-compare
# drivers encode 10-21 frame cells, squarely in this region (measured
# 1.54x, PROFILE.md §12).  LONG runs measured FASTER serial on both
# batched axes (§12b: 8x60-frame multi-stream 0.78-0.80x in two weather
# windows; §12c: 8x60-frame shared-input QP sweep 0.88x): sequential
# passes already saturate the d2h wire and the one-core host, and
# batching frees no resource at 0.0018% MFU — so they route through the
# serial loop and the lane is never-worse.
BATCH_MAX_FRAMES = int(os.environ.get("BVC_BATCH_MAX_FRAMES",
                                      str(MAX_CHUNK)))


def encode_videos_batched(runs, results_csv_path: str | None = "results.csv"):
    """Encode every run in ``runs`` (a list of :class:`InputParameters`),
    batching groups of same-shape configs (QP / I_Period / bitrate /
    stream are batched axes) into shared device programs.  Artifact trees
    are written exactly as by per-run :func:`encode_video` calls.
    Returns a :class:`BatchEncodeResult`."""
    from ..encoder import encode_video  # backend dispatcher (golden fallback)

    runs = list(runs)
    groups: dict = {}
    for i, p in enumerate(runs):
        key = _group_key(p) if _batchable(p) else ("serial", i)
        groups.setdefault(key, []).append(i)
    # split unprofitable (long-run) groups into serial singletons
    for key in list(groups):
        idxs = groups[key]
        if (len(idxs) > 1
                and runs[idxs[0]].frames_to_process > BATCH_MAX_FRAMES):
            del groups[key]
            for i in idxs:
                groups[("serial", i)] = [i]
    n_batched = 0
    elapsed = [0.0] * len(runs)
    for idxs in groups.values():
        if len(idxs) == 1:
            t0 = time.time()
            encode_video(runs[idxs[0]], results_csv_path)
            elapsed[idxs[0]] = time.time() - t0
        else:
            dt = _encode_group([runs[i] for i in idxs], results_csv_path)
            for i in idxs:
                elapsed[i] = dt / len(idxs)
            n_batched += 1
    return BatchEncodeResult(n_batched, elapsed)


@lru_cache(maxsize=None)
def _batch_fn(kind: str, bs: int, search_range: int, fast: bool,
              frac: bool, exact: bool, int8q: bool, mv8: bool, q4: bool,
              tail: bool, packed_shape: tuple | None, qfrac: tuple | None,
              first_is_intra: bool, shared_input: bool = True,
              devb: bool = False, rc1: bool = False):
    """Jitted vmap of the serial chunk program over the config axis: frames
    broadcast when every config encodes the same stream (``shared_input``),
    batched otherwise (multi-stream serving); refs / half-pel planes /
    reference-stack counts / row QPs / initial QPs / frame budgets — and
    for the mixed lane the per-frame intra flags — carry one entry per
    config.  ``kind``: 'intra_all' | 'gop' | 'multiref' | 'mixed'."""
    if kind == "intra_all":
        def one(frames, ref, hp, nv, is_i, row_qps, iqp, budget0, expp,
                pavg, tblq, tblb):
            return encode_chunk_intra_only(
                frames, row_qps, budget0, tblq, tblb, iqp, bs, rc1,
                exact=exact, compact=True, int8q=int8q, q4=q4, tail=tail,
                packed_shape=packed_shape, qfrac=qfrac, devb=devb)
    elif kind == "mixed":
        def one(frames, ref, hp, nv, is_i, row_qps, iqp, budget0, expp,
                pavg, tblq, tblb):
            return encode_chunk_mixed(
                frames, ref, hp, is_i, row_qps, budget0, tblq, tblb, iqp,
                bs, search_range, rc1, fast, frac, exact=exact,
                compact=True, int8q=int8q, mv8=mv8, q4=q4, tail=tail,
                packed_shape=packed_shape, qfrac=qfrac, devb=devb)
    elif kind == "multiref":
        def one(frames, ref, hp, nv, is_i, row_qps, iqp, budget0, expp,
                pavg, tblq, tblb):
            return encode_chunk_multiref(
                frames, ref, hp, nv, row_qps, budget0, tblq, tblb, iqp,
                bs, search_range, rc1, fast, frac, first_is_intra,
                exact=exact, compact=True, int8q=int8q, mv8=mv8, q4=q4,
                tail=tail, packed_shape=packed_shape, qfrac=qfrac, devb=devb)
    elif kind == "two_pass":
        def one(frames, ref, hp, nv, is_i, row_qps, iqp, budget0, expp,
                pavg, tblq, tblb):
            return encode_chunk_two_pass(
                frames, ref, hp, nv, pavg, budget0, tblq, tblb, expp, iqp,
                bs, search_range, fast, frac, first_is_intra,
                exact=exact, compact=True, int8q=int8q, mv8=mv8, q4=q4,
                tail=tail, packed_shape=packed_shape, qfrac=qfrac, devb=devb)
    else:
        def one(frames, ref, hp, nv, is_i, row_qps, iqp, budget0, expp,
                pavg, tblq, tblb):
            return encode_chunk(
                frames, ref, hp, row_qps, budget0, tblq, tblb, iqp, bs,
                search_range, rc1, fast, frac, first_is_intra, exact=exact,
                compact=True, int8q=int8q, mv8=mv8, q4=q4, tail=tail,
                packed_shape=packed_shape, qfrac=qfrac, devb=devb)

    vm = jax.vmap(one, in_axes=(None if shared_input else 0,
                                0, 0, 0, 0, 0, 0, 0, 0, 0, None, None))
    return jax.jit(vm)


def _shared_statics(ecs):
    """Conservative meet of the per-config transport statics: every config
    in the group must fit the shared layout (caps only ever grow — transport
    sizing never changes artifact bytes, only wire bytes)."""
    int8q = all(PK.qdct_int8_safe(ec) for ec in ecs)
    mv8 = all(PK.mv_int8_safe(ec) for ec in ecs)
    q4 = all(PK.qdct_nibble_safe(ec) for ec in ecs)
    mvn = all(PK.mv_nibble_safe(ec) for ec in ecs)
    qfrac = max((PK.qcap_fraction(ec) for ec in ecs),
                key=lambda f: f[0] / f[1])
    return int8q, mv8, q4, mvn, qfrac


def _encode_group(runs, results_csv_path):
    from concurrent.futures import ThreadPoolExecutor

    t_group0 = time.time()
    runs = sorted(runs, key=lambda p: p.encoder_config.quantization_factor)
    ecs = [p.encoder_config for p in runs]
    ec0 = ecs[0]
    C = len(runs)
    bs = ec0.block_size
    y_size = runs[0].width * runs[0].height
    n_total = runs[0].frames_to_process
    frac = ec0.fracMeEnabled
    exact = getattr(ec0, "exact_transform", False)
    rc1 = ec0.RCflag == 1          # uniform across the group (_group_key)
    two_pass = ec0.RCflag > 1      # uniform across the group (_group_key)
    R = ec0.nRefFrames             # uniform across the group (_group_key)
    ips = sorted({ec.I_Period for ec in ecs})
    intra_only = ips == [1] and not two_pass
    # configs with DIFFERENT GOP structures share one program through the
    # runtime-mode lane: per-frame intra flags are traced per config, and
    # chunks stop being capped at one GOP (MAX_CHUNK frames per dispatch)
    mixed = len(ips) > 1
    # the fused two-pass program carries its own rolling stack (R >= 1),
    # so RC 2/3 groups never route through the multiref kind
    multiref = R > 1 and not intra_only and not two_pass
    for ec in ecs:
        _load_rc_table(ec)
    tbl_np = _table_arrays(ec0)
    tbl = (jnp.asarray(tbl_np[0]), jnp.asarray(tbl_np[1]))
    # RC batches over target bitrates: the per-frame budget is the only
    # per-config RC input (the row chain is device scalar math)
    budget0 = (jnp.asarray([bit_budget_per_frame(ec) for ec in ecs],
                           jnp.float32)
               if ec0.RCflag else jnp.zeros((C,), jnp.float32))
    if two_pass:
        # scene-change statistic + pass-1 QP seed, per config — the SAME
        # helper the serial pipeline seeds from (byte-parity-critical)
        seeds = [_two_pass_seed_scalars(ec, bs) for ec in ecs]
        expp = jnp.asarray([s[0] for s in seeds], jnp.float32)
        pavg = jnp.asarray([s[1] for s in seeds], jnp.int32)
    else:
        expp = jnp.zeros((C,), jnp.float32)
        pavg = jnp.zeros((C,), jnp.int32)

    pw, ph = padded_dims(runs[0].width, runs[0].height, bs)
    nbr = ph // bs
    nb_pad = (ph // bs) * (pw // bs)
    int8q, mv8, q4, mvn, qfrac = _shared_statics(ecs)
    vbytes = 1 if int8q else 2
    tail_mode = os.environ.get("BVC_TAIL", "1") != "0"
    upack = os.environ.get("BVC_UPACK", "1") != "0"
    # devbits (models/pipeline.py): the device packs the FINAL bitstreams —
    # with C configs sharing the one-core host, deleting the per-config
    # entropy encode is where the batch multiplier actually comes from
    devb = tail_mode and os.environ.get("BVC_DEVBITS", "1") != "0"
    jt = q4 and not rc1  # tight kind cap only at fixed QP (pipeline parity)
    mvk = 3 if R > 1 else 2  # single-ref layouts drop the ref idx
    if intra_only:
        layout = PK.FrameLayout(ph, pw, bs, vbytes, False, False, q4=q4,
                                tail=tail_mode, qfrac=qfrac, devbits=devb)
    elif mixed or two_pass:
        # runtime-mode rows (mode is a traced value): every row carries both
        # mv and art fields, no joint-kind transport (pipeline "mixed" lane)
        layout = PK.FrameLayout(ph, pw, bs, vbytes, True, True, mv8, q4,
                                False, tail=tail_mode, mvk=mvk, mvn=mvn,
                                qfrac=qfrac, devbits=devb)
    else:
        layout = PK.FrameLayout(ph, pw, bs, vbytes, True, True, mv8, q4, jt,
                                tail=tail_mode, mvk=mvk, mvn=mvn, qfrac=qfrac,
                                devbits=devb)
    qcap, qecap, ecap, jkcap, q4cap = (layout.capq, layout.capqe, layout.cape,
                                       layout.capk, layout.capq4)

    sinks = [_EncodeSink(p) for p in runs]
    writer = ThreadPoolExecutor(max_workers=1)
    wq: deque = deque()
    write_failed = []

    def _resolve_and_write(c, f, dispatch_dt):
        if write_failed:
            raise RuntimeError("skipped: an earlier frame failed")
        try:
            if hasattr(f, "result"):
                f = f.result()
            with _stage("write artifacts"):
                sinks[c].write(f, dispatch_dt)
        except BaseException:
            write_failed.append(True)
            raise

    def write_async(c, f, dispatch_dt):
        while wq and wq[0].done():
            wq.popleft().result()
        while len(wq) >= 64 * C:
            wq.popleft().result()
        wq.append(writer.submit(_resolve_and_write, c, f, dispatch_dt))

    fin_pool = ThreadPoolExecutor(max_workers=4)
    # ONE ordered rebuild worker shared by all configs: C private workers
    # on the one-core host only thrash the GIL (measured: 8-stream batched
    # ran 0.75x serial with per-config workers)
    rebuild_pool = ThreadPoolExecutor(max_workers=1)
    rebuilders = [_ReconRebuilder(ec, ph, pw, fin_pool, pool=rebuild_pool)
                  for ec in ecs]
    overflow_frames = [0]

    row_qps = jnp.asarray(np.stack([
        np.full(nbr, ec.quantization_factor, np.int32) for ec in ecs]))
    iqps = jnp.asarray(np.array(
        [ec.quantization_factor for ec in ecs], np.int32))
    gray = jnp.full((C, ph, pw), 128, jnp.uint8)
    if multiref or two_pass:
        # rolling reference stack per config, deque semantics: slot 0 =
        # oldest; seeded with one gray frame (reference encoder.py:33).
        # The fused two-pass program always carries a stack (R == 1 for
        # single-reference runs).
        refs = jnp.zeros((C, R, ph, pw), jnp.uint8).at[:, 0].set(gray)
        hps = jnp.zeros((C, R, 2 * ph, 2 * pw), jnp.uint8)
        nv = jnp.ones((C,), jnp.int32)
        if frac:
            from ..ops.interp import build_half_pel

            hps = hps.at[:, 0].set(jax.vmap(build_half_pel)(gray))
    else:
        refs = gray
        hps = jnp.zeros((C, 2 * ph, 2 * pw), jnp.uint8)
        nv = jnp.zeros((C,), jnp.int32)  # unused placeholder
        if frac:
            from ..ops.interp import build_half_pel

            hps = jax.vmap(build_half_pel)(gray)

    pending: deque = deque()
    tail_stats: dict = {}  # (config, kind) -> recent per-frame pool bytes

    def prefetch(c, kind, fused, n_frames):
        if not tail_mode:
            # heads-only transport: [K, total] per config, no pool to size
            sl = fused.reshape(-1)
            sl.copy_to_host_async()
            return sl
        base = n_frames * layout.total
        hist = tail_stats.get((c, kind))
        if not hist:
            other = [max(h) for h in tail_stats.values() if h]
            hist = [max(other) * 1.25] if other else None
        if hist:
            est = int(max(hist) * n_frames * 1.25) + 4096
        else:
            # no history anywhere: a shortfall here stalls EVERY config in
            # the group on one synchronous top-up round (measured 0.45-1.4 s
            # on the tunnel), while over-fetching costs only its own wire
            # bytes — so the cold estimate is half the worst-case pool
            # (devbits pool caps are ~3.5x larger worst-case bitstream
            # buffers; scale the divisor to the same byte guess)
            est = (n_frames * PK.tail_pool_cap(layout)
                   // (7 if layout.devbits else 2))
        sl = fused[: min(fused.shape[0], base + _bucket(est))]
        sl.copy_to_host_async()
        return sl

    def submit_frames(c, kind, dev, bufs, indices, currs):
        """Rebuild + finalize one config's frames from its parsed
        (heads, segs, tail bytes) and hand them to the writer.  Mirrors
        pipeline.finish_compact for the batch shapes ([C, ...] stacks);
        head parsing and tail top-ups happen batched in fetch_round."""
        k = len(indices)
        heads, segs, tail_np = bufs
        if kind in ("intra_all", "mixed", "two_pass"):
            d_recons = dev[0][c]
            d_arts = dev[1][c]
            d_qdcts = dev[2][c]
            intra_planes, pos = None, 0
        else:
            d_recons, d_arts, d_qdcts = (dev[1][0][c], dev[1][1][c],
                                         dev[1][2][c])
            intra_planes = ((dev[0][2][c], dev[0][1][c], dev[0][0][c])
                            if kind == "intra_led" else None)
            pos = 1 if kind == "intra_led" else 0
        ec = ecs[c]
        reb = rebuilders[c]
        for i in range(k):
            t = (tail_np[segs[i] : segs[i + 1]] if tail_mode
                 else np.zeros(0, np.uint8))
            f = layout.split(heads[i], t)
            if intra_planes is not None and i == 0:
                d_q, d_a, d_r = intra_planes
            else:
                j = i - pos
                d_q, d_a, d_r = d_qdcts[j], d_arts[j], d_recons[j]
            with _stage("overflow fallback fetch"):
                jover = f["jn"] > jkcap
                q_over = (not PK.devbits_ok(f) if layout.devbits
                          else (f["qt"] > qcap or f["qn"] > qecap
                                or f["qn4"] > q4cap))
                q_full = jax.device_get(d_q) if q_over else None
                a_full = (jax.device_get(d_a)
                          if int(f["meta"][0]) == INTER
                          and (f["an"] > ecap or jover) else None)
                r_full = (jax.device_get(d_r)
                          if f["rn"] > ecap or jover else None)
            if q_full is not None or a_full is not None or r_full is not None:
                overflow_frames[0] += 1
            rebuilt = reb.submit(f, q_full, r_full, a_full)
            fut = fin_pool.submit(_finalize_compact, indices[i], currs[i],
                                  f, ec, rebuilt, a_full)
            write_async(c, fut, 0.0)

    def fetch_round():
        indices, currs, kind, dev, pres = pending.popleft()
        k = len(indices)
        base = k * layout.total
        # fetch + submit config-BY-config: each device_get waits only for
        # that config's async copy, so host rebuild/finalize of config c
        # overlaps the remaining configs' wire time (one grouped device_get
        # across all C configs serialized the whole round's backlog in
        # front of any host work).  Prediction shortfalls are deferred and
        # topped up in ONE batched device_get at the end of the round.
        shortfall = []
        for c in range(C):
            with _stage("fetch (device_get)"):
                buf = jax.device_get(pres[c])
            if not tail_mode:
                submit_frames(c, kind, dev,
                              (buf.reshape(k, layout.total), None,
                               np.zeros(0, np.uint8)),
                              indices, currs if shared else currs[c])
                continue
            heads = buf[:base].reshape(k, layout.total)
            sizes = [sum(layout.tail_sizes(*layout.head_counts(heads[i])))
                     for i in range(k)]
            segs = np.cumsum([0] + sizes)
            total = int(segs[-1])
            tail_stats.setdefault((c, kind), deque(maxlen=4)).append(
                total / max(k, 1))
            tail_np = buf[base : base + total]
            if tail_np.size < total:
                shortfall.append((c, heads, segs, total))
                continue
            submit_frames(c, kind, dev, (heads, segs, tail_np), indices,
                          currs if shared else currs[c])
        if shortfall:
            with _stage("fetch (late top-up)"):
                # the heads region [0, base) already landed; fetch only the
                # missing pool bytes
                lates = jax.device_get([
                    dev[4][c][base : min(base + _bucket(t),
                                         dev[4][c].shape[0])]
                    for c, _, _, t in shortfall])
            for (c, heads, segs, total), late in zip(shortfall, lates):
                submit_frames(c, kind, dev, (heads, segs, late[:total]),
                              indices, currs if shared else currs[c])

    n_read = 0
    truncated_tail = 0
    paths = [os.path.abspath(p.y_only_file) for p in runs]
    shared = len(set(paths)) == 1
    # keep the dispatch pipeline filled on SHORT runs: one chunk serializes
    # upload -> device -> wire -> host finalize with zero overlap (the sweep
    # drivers encode 10-frame cells, which fit MAX_CHUNK whole).  Split into
    # ~DEPTH+2 near-equal chunks — at most two distinct sizes, since every
    # distinct chunk length is its own (expensively) compiled program.
    cap = int(os.environ.get("BVC_BATCH_CHUNK", "0")) or max(
        2, min(MAX_CHUNK, -(-n_total // (DEPTH + 2))))
    fins = []
    try:
        fins = [open(paths[0], "rb")] if shared else [
            open(pth, "rb") for pth in paths]
        while n_read < n_total:
            k = (min(cap, n_total - n_read) if intra_only or mixed
                 else min(cap, ec0.I_Period - n_read % ec0.I_Period,
                          n_total - n_read))
            raws = [f.read(y_size * k) for f in fins]
            counts = {len(r) // y_size for r in raws}
            if not shared and len(counts) > 1:
                raise ValueError(
                    "multi-stream batch: input streams have unequal frame "
                    f"counts at frame {n_read} ({sorted(counts)})")
            n_frames = counts.pop()
            truncated_tail = max(len(r) % y_size for r in raws)
            if n_frames == 0:
                break

            def _stack(raw):
                if (ph, pw) == (runs[0].height, runs[0].width):
                    # aligned resolution: one zero-copy view per stream
                    # (per-frame pad_frame+np.stack cost ~200 ms/chunk of
                    # main-thread time at C=8 under GIL contention)
                    return np.frombuffer(
                        raw, np.uint8, count=n_frames * y_size
                    ).reshape(n_frames, ph, pw)
                return np.stack([
                    pad_frame(np.frombuffer(
                        raw[i * y_size : (i + 1) * y_size], np.uint8
                    ).reshape(runs[0].height, runs[0].width), bs)
                    for i in range(n_frames)
                ])

            with _stage("prep: pad+stack"):
                # shared: [k, H, W] broadcast; multi-stream: [C, k, H, W]
                frames_np = (_stack(raws[0]) if shared
                             else np.stack([_stack(r) for r in raws]))
            pshape = None
            ubuf = None
            if upack:
                # the packed upload buffer is fixed-size (nibbles + escape
                # cap), so multi-stream packs per stream and stacks; any
                # escape-heavy stream falls the whole chunk back to raw
                from ..entropy.native import pack_input_frames

                with _stage("prep: input pack"):
                    if shared:
                        ubuf = pack_input_frames(
                            frames_np, PK.input_esc_cap(ph, pw))
                    else:
                        bufs_in = [pack_input_frames(
                            f, PK.input_esc_cap(ph, pw)) for f in frames_np]
                        if all(b is not None for b in bufs_in):
                            ubuf = np.stack(bufs_in)
            with _stage("dispatch: h2d asarray"):
                fr_dev = jnp.asarray(
                    ubuf if ubuf is not None else frames_np)
            if ubuf is not None:
                pshape = (n_frames, ph, pw)
            first_is_intra = (not intra_only and not mixed
                              and n_read % ec0.I_Period == 0)
            if mixed:
                is_i = jnp.asarray(np.stack([
                    np.fromiter(((n_read + i) % ec.I_Period == 0
                                 for i in range(n_frames)),
                                dtype=bool, count=n_frames)
                    for ec in ecs]))
            else:
                is_i = jnp.zeros((C, n_frames), bool)  # unused placeholder
            fnkind = ("two_pass" if two_pass
                      else "intra_all" if intra_only
                      else "mixed" if mixed
                      else "multiref" if multiref else "gop")
            fn = _batch_fn(fnkind, bs, max(ec0.search_range, 0),
                           ec0.fastME, frac, exact, int8q, mv8, q4,
                           tail_mode, pshape, qfrac,
                           first_is_intra, shared_input=shared, devb=devb,
                           rc1=rc1)
            out = fn(fr_dev, refs, hps, nv, is_i, row_qps, iqps, budget0,
                     expp, pavg, tbl[0], tbl[1])
            if two_pass:
                dev, refs, hps, nv, pavg = out
                kind = "two_pass"
            elif intra_only:
                dev = out
                kind = "intra_all"
            elif mixed:
                dev, refs, hps = out
                kind = "mixed"
            elif multiref:
                refs, hps, nv = out[2], out[3], out[4]
                # normalize to the fetcher's (intra_out, p_out, _, _, packed)
                dev = (out[0], out[1], None, None, out[5])
                kind = "intra_led" if first_is_intra else "p_only"
            else:
                dev = out
                refs, hps = dev[2], dev[3]
                kind = "intra_led" if first_is_intra else "p_only"
            with _stage("dispatch: async-copy+prefetch"):
                pres = [prefetch(c, kind, dev[4][c], n_frames)
                        for c in range(C)]
            indices = list(range(n_read + 1, n_read + n_frames + 1))
            pending.append((indices, frames_np, kind, dev, pres))
            n_read += n_frames
            if truncated_tail:
                break
            while len(pending) > DEPTH:
                fetch_round()
        while pending:
            fetch_round()
        if truncated_tail:
            raise ValueError(
                f"truncated frame: read {truncated_tail} of "
                f"{y_size} bytes")
    finally:
        for f in fins:
            f.close()
        try:
            while wq:
                wq.popleft().result()
        finally:
            for r in rebuilders:
                r.shutdown()
            rebuild_pool.shutdown(wait=True)
            fin_pool.shutdown(wait=True)
            writer.shutdown(wait=True)
            for s in sinks:
                s.close()
        if n_read and overflow_frames[0] > max(C * n_read // 50, 2):
            logger.warning(
                f"compact-transfer overflow on {overflow_frames[0]}/"
                f"{C * n_read} batched frames")
    elapsed = time.time() - t_group0
    from . import pipeline as _pl

    if _pl.STAGE_TIMER is not None:
        logger.info("batched stage breakdown (BVC_PROFILE):\n"
                    + _pl.STAGE_TIMER.report())
    logger.info(
        f"batched encode: {C} configs x {n_read} frames in {elapsed:.2f}s "
        f"= {C * n_read / max(elapsed, 1e-9):.1f} config-frames/s")
    for p in runs:
        _append_throughput(p, elapsed / C, results_csv_path)
    return elapsed
