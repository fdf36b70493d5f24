#!/usr/bin/env python
"""In-kernel stage attribution for the Pallas merge probe (VERDICT r4
item 4): times the probe at bench geometry in three compiled variants —
full, row-select stubbed (ablate=1), and DMA-only (ablate=2) — so the
18 ms probe delta decomposes into DMA / row-select matmul / match-roll
tail.  All timings are d2h-forced (block_until_ready alone is not a
completion barrier on this backend; see tools/dict_ablate.py).

Run with the TPU tunnel attached and otherwise idle:
    python tools/probe_ablate.py [--genomes 30] [--chunk-log2 22]
"""

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genomes", type=int, default=30)
    ap.add_argument("--chunk-log2", type=int, default=22)
    ap.add_argument("--k", type=int, default=21)
    ap.add_argument("--tile-q", type=int, default=0,
                    help="override tile_q (0 = library default)")
    ap.add_argument("--span", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import panagram_tpu  # noqa: F401
    from panagram_tpu.ops import pallas_kernels as pk
    from panagram_tpu.ops.lookup import BucketedDict, mix64_np, row_pack
    from panagram_tpu.ops.ref_impl import build_dict_np, canonical_kmers_np

    k = args.k
    Q = 1 << args.chunk_log2
    rng = np.random.default_rng(0)
    glen = 1 << 21
    base = rng.integers(0, 4, glen, dtype=np.uint8)
    founders = []
    for f in range(4):
        mut = base.copy()
        pos = rng.choice(glen, glen // 100, replace=False)
        mut[pos] = rng.integers(0, 4, len(pos), dtype=np.uint8)
        founders.append(mut)
    sets = []
    for g in range(args.genomes):
        mut = founders[g % 4].copy()
        pos = rng.choice(glen, glen // 1000, replace=False)
        mut[pos] = rng.integers(0, 4, len(pos), dtype=np.uint8)
        canon, valid = canonical_kmers_np(mut, k)
        sets.append(np.unique(canon[valid]))
    keys, masks = build_dict_np(sets)
    bd = BucketedDict.build(keys, masks, args.genomes, k)
    (t1,) = bd.device_arrays()
    print(f"dict D={len(keys)} table {t1.shape} nbits={bd.nbits}",
          flush=True)

    # bench-representative queries: mixed keys of a genome slice, sorted
    codes = np.tile(founders[0], -(-(Q + k - 1) // glen))[: Q + k - 1]
    canon, valid = canonical_kmers_np(codes, k)
    m = mix64_np(np.where(valid, canon, np.uint64(0xFFFFFFFFFFFFFFFF)))
    m.sort()
    qhi = (m >> np.uint64(32)).astype(np.uint32)
    qlo = (m & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    tile_q = args.tile_q or pk.TILE_Q
    B = 1 << bd.nbits
    pack = row_pack(bd.stride, B)
    Bp = B // pack
    expect = max(tile_q * Bp // Q, 1)
    span = args.span or min(
        Bp, max((1 << 19) // (bd.stride * pack), 64),
        max((-(-3 * expect // 2) + 7) & ~7, 64))
    ntiles = Q // tile_q
    bl = np.minimum((qhi >> np.uint32(32 - bd.nbits)).astype(np.int32)
                    >> int(np.log2(pack)),
                    Bp - span).reshape(ntiles, tile_q)[:, 0].copy()
    print(f"tile_q={tile_q} span={span} pack={pack} ntiles={ntiles}",
          flush=True)

    qhi_d, qlo_d = jnp.asarray(qhi), jnp.asarray(qlo)
    bl_d = jnp.asarray(bl)
    jax.block_until_ready((qhi_d, qlo_d, bl_d))

    from functools import partial

    fns = {a: jax.jit(partial(
        pk.probe_sorted, nbits=bd.nbits, cap=bd.cap, nwords=bd.nwords,
        span=span, pack=pack, tile_q=tile_q, ablate=a))
        for a in (0, 1, 2)}

    def run(ablate):
        out = fns[ablate](qhi_d, qlo_d, bl_d, t1)
        jax.block_until_ready(out)
        np.asarray(out[:, :1])
        return out

    for ablate, label in ((2, "DMA only"), (1, "DMA + match/roll tail"),
                          (0, "full (one-hot row-select)")):
        run(ablate)  # compile
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            run(ablate)
            best = min(best, time.perf_counter() - t0)
        print(f"ablate={ablate} {label:28s} {1e3*best:7.1f} ms "
              f"({Q/best/1e6:.0f} M rows/s)", flush=True)


if __name__ == "__main__":
    main()
