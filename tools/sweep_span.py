#!/usr/bin/env python
"""Geometry sweep for the Pallas merge probe (ops/pallas_kernels.probe_sorted).

The merge-probe kernel's row-select is an MXU one-hot matmul whose cost per
query is span x stride MACs x 4 byte planes, and span scales with
tile_q x Bp/Qp — so (tile_q, span) are swept together.  Out-of-span
queries are patched by the gather-probe fixup (ops/lookup.py), so tight
spans stay correct; the sweep reports each config's expected out-of-span
tail vs the fixup capacity (beyond it the library silently falls back to
the gather probe, making the timing meaningless).

Usage: python tools/sweep_span.py [--chunk LOG2] [--genomes N]
                                  [--configs tile_q:span ...]
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
    print(f"{label:34s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=22)
    ap.add_argument("--genomes", type=int, default=30)
    ap.add_argument("--configs", nargs="*",
                    default=["2048:0", "1024:0", "512:0"],
                    help="tile_q:span pairs; span 0 = library default")
    args = ap.parse_args()

    import panagram_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from functools import partial

    from panagram_tpu.ops import lookup as L
    from panagram_tpu.ops.lookup import (BucketedDict, bucket_query,
                                         bucket_query_sorted, mix64_np)
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

    stride = bd.stride
    B = 1 << bd.nbits
    pack = 1
    while (stride * pack) % 128 or B % pack:
        pack *= 2
    Bp = B // pack
    mixed = np.sort(mix64_np(canon_np))
    brow_all = (mixed >> np.uint64(64 - bd.nbits)).astype(np.int64) >> (
        pack.bit_length() - 1)

    for cfg in args.configs:
        tq_s, sp_s = cfg.split(":")
        tile_q, env_span = int(tq_s), int(sp_s)
        os.environ["PANAGRAM_TPU_TILE_Q"] = str(tile_q)
        if env_span:
            os.environ["PANAGRAM_TPU_PROBE_SPAN"] = str(env_span)
        else:
            os.environ.pop("PANAGRAM_TPU_PROBE_SPAN", None)

        # replicate the library's geometry to report the fixup load
        Qp = -(-P // tile_q) * tile_q
        expect = max(tile_q * Bp // Qp, 1)
        span = env_span or min(
            Bp, max((1 << 19) // (stride * pack), 64),
            max((-(-3 * expect // 2) + 7) & ~7, 64))
        fixup = max(Qp >> 6, tile_q)
        brow = np.concatenate(
            [brow_all, np.full(Qp - P, Bp - 1, np.int64)])
        blo = np.clip(brow[::tile_q], 0, Bp - span)
        pad = np.zeros(Qp, bool)
        pad[P:] = True
        n_out = int(((brow - np.repeat(blo, tile_q) >= span) & ~pad).sum())
        note = f"out={n_out}/{fixup}"
        if n_out > fixup:
            note += "  FALLBACK (timing = gather path)"

        bucket_query_sorted.clear_cache()
        fn = jax.jit(lambda c, t: qs(c, t).sum())
        got = np.asarray(fn(canon_dev, t1))
        ok = "OK" if got == ref else f"MISMATCH {got} != {ref}"
        t_p = timed(f"merge tile_q={tile_q} span={span}",
                    lambda: np.asarray(fn(canon_dev, t1)))
        print(f"  -> {P/t_p/1e6:.1f} M rows/s  parity {ok}  {note}",
              flush=True)


if __name__ == "__main__":
    main()
