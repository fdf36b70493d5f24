#!/usr/bin/env python
"""Span sweep for the Pallas merge probe (ops/pallas_kernels.probe_sorted).

The merge-probe kernel's row-select is an MXU one-hot matmul whose cost is
TILE_Q x span x stride MACs x 4 byte planes — span is the main lever
(ROUND2_NOTES.md).  This times bucket_query_sorted at several spans plus
the gather probe reference, on whatever accelerator is attached.

Usage: python tools/sweep_span.py [--chunk LOG2] [--genomes N] [--spans ...]
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timed(label, fn, reps=3):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=22)
    ap.add_argument("--genomes", type=int, default=30)
    ap.add_argument("--spans", type=int, nargs="*",
                    default=[1024, 512, 256])
    args = ap.parse_args()

    import panagram_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from functools import partial

    from panagram_tpu.ops.lookup import (BucketedDict, bucket_query,
                                         bucket_query_sorted)
    from panagram_tpu.ops.ref_impl import build_dict_np, canonical_kmers_np

    k = 21
    n = args.genomes
    P = 1 << args.chunk
    rng = np.random.default_rng(0)
    print(f"devices={jax.devices()} chunk=2^{args.chunk} genomes={n}",
          flush=True)

    glen = 1 << 21
    base = rng.integers(0, 4, glen, dtype=np.uint8)
    sets = []
    for g in range(n):
        mut = base.copy()
        pos = rng.choice(glen, glen // 100, replace=False)
        mut[pos] = rng.integers(0, 4, len(pos), dtype=np.uint8)
        canon, valid = canonical_kmers_np(mut, k)
        sets.append(np.unique(canon[valid]))
    keys, masks = build_dict_np(sets)
    bd = BucketedDict.build(keys, masks, n, k)
    (t1,) = bd.device_arrays()
    print(f"dict {len(keys)} keys, table {bd.table.shape}", flush=True)

    codes = np.tile(base, -(-(P + k - 1) // glen))[: P + k - 1]
    canon_np = canonical_kmers_np(codes, k)[0]
    canon_dev = jax.device_put(jnp.asarray(canon_np))

    qg = partial(bucket_query, nbits=bd.nbits, cap=bd.cap, nwords=bd.nwords)

    @jax.jit
    def stage_gather(c, t):
        return qg(c, t).sum()

    ref = np.asarray(stage_gather(canon_dev, t1))
    t_g = timed("gather probe", lambda: np.asarray(stage_gather(canon_dev, t1)))
    print(f"  -> {P/t_g/1e6:.1f} M rows/s", flush=True)

    qs = partial(bucket_query_sorted, nbits=bd.nbits, cap=bd.cap,
                 nwords=bd.nwords)

    # host-side span feasibility (a too-small span silently lax.cond-falls
    # back to the gather probe, making its timing meaningless)
    from panagram_tpu.ops.lookup import mix64_np
    import panagram_tpu.ops.pallas_kernels as pk

    stride = bd.stride
    B = 1 << bd.nbits
    pack = 1
    while (stride * pack) % 128 or B % pack:
        pack *= 2
    Bp = B // pack
    Qp = -(-P // pk.TILE_Q) * pk.TILE_Q
    ms = np.sort(mix64_np(canon_np))
    ms = np.concatenate([ms, np.full(Qp - P, np.uint64(2**64 - 1))])
    brow = (ms >> np.uint64(64 - bd.nbits)).astype(np.int64) >> (
        pack.bit_length() - 1)

    for span in args.spans:
        blo = np.clip(brow[:: pk.TILE_Q], 0, Bp - span)
        inspan = ((brow - np.repeat(blo, pk.TILE_Q) < span)
                  | (ms == np.uint64(2**64 - 1)))
        if not inspan.all():
            print(f"merge probe span={span}: INFEASIBLE "
                  f"({(~inspan).sum()} out-of-span queries) — skipping",
                  flush=True)
            continue
        os.environ["PANAGRAM_TPU_PROBE_SPAN"] = str(span)
        fn = jax.jit(lambda c, t: qs(c, t).sum())
        got = np.asarray(fn(canon_dev, t1))
        ok = "OK" if got == ref else f"MISMATCH {got} != {ref}"
        t_p = timed(f"merge probe span={span}",
                    lambda: np.asarray(fn(canon_dev, t1)))
        print(f"  -> {P/t_p/1e6:.1f} M rows/s  parity {ok}", flush=True)


if __name__ == "__main__":
    main()
