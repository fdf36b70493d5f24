#!/usr/bin/env python
"""Per-stage device timing of the anchor chunk pipeline.

Times each jitted stage in isolation on the attached accelerator (forcing
completion with a host transfer of a small reduction — block_until_ready
under-reports on the tunnel rig, see memory notes):

  unpack+pack  : packed bases -> canonical k-mers
  sort         : 4M u64 radix sort (merge-probe prologue)
  gather probe : bucket_query (one wide random gather per query)
  pallas probe : bucket_query_sorted (sort + streamed DMA + unsort)
  rle tail     : popcount/bytes/RLE/scatter given precomputed rows
  full chunk   : anchor_chunk_rle2 end-to-end (both probe modes)

Usage: python tools/profile_anchor.py [--chunk LOG2] [--genomes N]
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
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best*1e3:9.1f} ms")
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=22)
    ap.add_argument("--genomes", type=int, default=30)
    ap.add_argument("--k", type=int, default=21)
    args = ap.parse_args()

    import panagram_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from functools import partial

    from panagram_tpu.ops import anchor as A
    from panagram_tpu.ops.codec import pack_kmers, unpack_bases
    from panagram_tpu.ops.lookup import (BucketedDict, bucket_query,
                                         bucket_query_sorted)
    from panagram_tpu.ops.ref_impl import build_dict_np, canonical_kmers_np

    k = args.k
    n = args.genomes
    P = 1 << args.chunk
    rng = np.random.default_rng(0)
    print(f"devices={jax.devices()} chunk=2^{args.chunk} genomes={n}")

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
    print(f"dict {len(keys)} keys, table {bd.table.shape}")

    codes = np.tile(base, -(-(P + k - 1) // glen))[: P + k - 1]
    inbuf, L = A.pack_bases_combined(codes)
    ib = jax.device_put(jnp.asarray(inbuf))
    nbytes = (n + 7) // 8
    capacity = P // 8

    n4 = (L + 3) // 4

    from panagram_tpu.ops.codec import pack_kmers_packed

    @jax.jit
    def stage_unpack(buf):
        packed = jax.lax.slice(buf, (0,), (n4,))
        nmask = jax.lax.slice(buf, (n4,), (buf.shape[0],))
        canon, _ = pack_kmers_packed(packed, nmask, L, k)
        return canon.sum()

    timed("pack_kmers_packed", lambda: np.asarray(stage_unpack(ib)))

    canon_np = canonical_kmers_np(codes, k)[0]
    canon_dev = jax.device_put(jnp.asarray(canon_np))

    @jax.jit
    def stage_sort(c):
        s = jax.lax.sort((c, jnp.arange(c.shape[0], dtype=jnp.int32)),
                         num_keys=1)
        return s[0][-1] + jnp.uint64(s[1][-1])

    timed("sort u64+idx", lambda: np.asarray(stage_sort(canon_dev)))

    qg = partial(bucket_query, nbits=bd.nbits, cap=bd.cap, nwords=bd.nwords)

    @jax.jit
    def stage_gather(c, t):
        return qg(c, t).sum()

    timed("gather probe", lambda: np.asarray(stage_gather(canon_dev, t1)))

    qs = partial(bucket_query_sorted, nbits=bd.nbits, cap=bd.cap,
                 nwords=bd.nwords)

    @jax.jit
    def stage_pallas(c, t):
        return qs(c, t).sum()

    timed("pallas merge probe",
          lambda: np.asarray(stage_pallas(canon_dev, t1)))

    @jax.jit
    def stage_tail(c, t):
        # the REAL production tail (an earlier synthetic 2D-sliced scatter
        # here lowered pathologically — 15.7 s at nbits=22 — and did not
        # represent anchor_chunk_rle2 at all)
        rows = qg(c, t)
        out, count = A.rle_payload(rows, nbytes, capacity)
        return out.sum() + count

    timed("tail rle_payload (incl gather)",
          lambda: np.asarray(stage_tail(canon_dev, t1)))

    pal_work = A.pal_work_for(P)

    @jax.jit
    def stage_tail4(c, t):
        rows = qg(c, t)
        data, pal, _cnt, _u = A.rle4_payload(rows, nbytes, pal_work)
        return data.sum() + pal.sum()

    timed("tail rle4_payload (incl gather)",
          lambda: np.asarray(stage_tail4(canon_dev, t1)))

    for name, flag in [("full rle2 (gather)", "0"),
                       ("full rle2 (pallas)", "1")]:
        os.environ["PANAGRAM_TPU_PALLAS"] = flag
        A.anchor_chunk_rle2.clear_cache()

        def run():
            combined = A.anchor_chunk_rle2(
                ib, t1, L, k, bd.nbits, bd.cap, bd.nwords, nbytes, capacity)
            A.collect_rle2(A.dispatch_rle_prefix(combined), combined)

        dt = timed(name, run)
        print(f"  -> {P/dt/1e6:.1f} M kmers/s")

    for name, flag in [("full rle4 (gather)", "0"),
                       ("full rle4 (pallas)", "1")]:
        os.environ["PANAGRAM_TPU_PALLAS"] = flag
        A.anchor_chunk_rle4.clear_cache()

        def run4():
            data, pal = A.anchor_chunk_rle4(
                ib, t1, L, k, bd.nbits, bd.cap, bd.nwords, nbytes,
                pal_work)
            prefix = A.dispatch_rle4_prefix(data, pal)
            A.collect_rle4(prefix, data, pal, pal_work)

        dt = timed(name, run4)
        print(f"  -> {P/dt/1e6:.1f} M kmers/s")


if __name__ == "__main__":
    main()
