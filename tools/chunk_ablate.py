#!/usr/bin/env python
"""Fused-delta ablation of the production anchor chunk program.

Per-stage profiler numbers on this rig sit on a ~30-50 ms dispatch-latency
floor (see tools/micro_ops.py, ROUND3_NOTES.md), so every stage here is a
SEPARATE fused jitted program ending in a tiny reduction; stage costs are
the DELTAS between cumulative programs:

  pack          = t(pack)            - t(base)
  mix+fwd sort  = t(sort)            - t(pack)
  probe kernel  = t(probe_noinv)     - t(sort)
  fixup+inverse = t(bqs)             - t(probe_noinv)
  v4 tail       = t(v4)              - t(bqs)

plus A/B candidates (gather probe, scatter-based inverse) measured the
same way.  Inputs/dict mirror bench.py's 30-genome k=21 config.  Run on
the TPU tunnel ONLY while nothing else touches it.
"""

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


def timed(label, fn, reps=5):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:34s} {best*1e3:9.1f} ms", flush=True)
    return best


def main():
    import panagram_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp

    from panagram_tpu.ops import pallas_kernels as pk
    from panagram_tpu.ops.anchor import pack_bases_combined, pal_work_for, \
        rle4_payload
    from panagram_tpu.ops.codec import SENTINEL, pack_kmers_packed
    from panagram_tpu.ops.lookup import BucketedDict, bucket_query, \
        bucket_query_sorted, mix64
    from panagram_tpu.ops.ref_impl import build_dict_np, canonical_kmers_np

    k = 21
    ngenomes = int(os.environ.get("ABL_GENOMES", "30"))
    chunk = 1 << int(os.environ.get("ABL_CHUNK_LOG2", "22"))
    dict_genome_len = 1 << int(os.environ.get("ABL_DICT_LOG2", "21"))

    rng = np.random.default_rng(0)
    print(f"devices={jax.devices()} chunk=2^{chunk.bit_length()-1}",
          flush=True)

    base_seq = rng.integers(0, 4, dict_genome_len, dtype=np.uint8)
    founders = []
    for f in range(4):
        mut = base_seq.copy()
        pos = rng.choice(dict_genome_len, dict_genome_len // 100,
                         replace=False)
        mut[pos] = rng.integers(0, 4, len(pos), dtype=np.uint8)
        founders.append(mut)
    sets = []
    genome0 = None
    for g in range(ngenomes):
        mut = founders[g % 4].copy()
        pos = rng.choice(dict_genome_len, dict_genome_len // 1000,
                         replace=False)
        mut[pos] = rng.integers(0, 4, len(pos), dtype=np.uint8)
        if g == 0:
            genome0 = mut
        canon, valid = canonical_kmers_np(mut, k)
        sets.append(np.unique(canon[valid]))
    keys, masks = build_dict_np(sets)
    bd = BucketedDict.build(keys, masks, ngenomes, k)
    (t1,) = bd.device_arrays()
    nbytes = (ngenomes + 7) // 8
    W = bd.nwords
    print(f"dict {len(keys)} keys, table {bd.table.shape} nbits={bd.nbits}",
          flush=True)

    reps_seq = -(-(chunk + k - 1) // dict_genome_len)
    codes = np.tile(genome0, reps_seq)[: chunk + k - 1]
    inbuf, L = pack_bases_combined(codes)
    n4 = (L + 3) // 4
    packed_d = jax.device_put(jnp.asarray(inbuf[:n4]))
    nmask_d = jax.device_put(jnp.asarray(inbuf[n4:]))
    pal_work = pal_work_for(chunk)

    U64 = np.uint64

    # NOTE: the table must be an ARGUMENT of every jitted fn — a closed-over
    # device array is embedded as a constant in the serialized program, and
    # the 256 MB payload blows the remote-compile request limit (HTTP 413).

    @jax.jit
    def f_base(p, m, t):
        return (p.astype(jnp.uint32).sum() + m.astype(jnp.uint32).sum())

    @jax.jit
    def f_pack(p, m, t):
        canon, _ = pack_kmers_packed(p, m, L, k)
        return (canon & U64(0xFFFF)).astype(jnp.uint32).sum()

    @jax.jit
    def f_sort(p, m, t):
        canon, _ = pack_kmers_packed(p, m, L, k)
        mm = mix64(canon)
        mhi = (mm >> U64(32)).astype(jnp.uint32)
        mlo = (mm & U64(0xFFFFFFFF)).astype(jnp.uint32)
        idx = jnp.arange(mhi.shape[0], dtype=jnp.int32)
        qhi, qlo, idxs = jax.lax.sort((mhi, mlo, idx), num_keys=1)
        return qhi.sum() + qlo.sum() + idxs.sum().astype(jnp.uint32)

    def _probe_parts(p, m, t1):
        """sorted queries -> (probe rows [W, Qp], qhi, qlo, idxs)."""
        canon, _ = pack_kmers_packed(p, m, L, k)
        mm = mix64(canon)
        Q0 = mm.shape[0]
        B = 1 << bd.nbits
        stride = bd.stride
        tile_q = pk.TILE_Q
        pack = 1
        while (stride * pack) % 128 or B % pack:
            pack *= 2
        Bp = B // pack
        Qp = -(-Q0 // tile_q) * tile_q
        mhi = (mm >> U64(32)).astype(jnp.uint32)
        mlo = (mm & U64(0xFFFFFFFF)).astype(jnp.uint32)
        S32 = jnp.uint32(0xFFFFFFFF)
        if Qp != Q0:
            padv = jnp.full(Qp - Q0, S32, jnp.uint32)
            mhi = jnp.concatenate([mhi, padv])
            mlo = jnp.concatenate([mlo, padv])
        idx = jnp.arange(Qp, dtype=jnp.int32)
        qhi, qlo, idxs = jax.lax.sort((mhi, mlo, idx), num_keys=1)
        expect = max(tile_q * Bp // Qp, 1)
        span = min(Bp, max((1 << 19) // (stride * pack), 64),
                   max((-(-3 * expect // 2) + 7) & ~7, 64))
        brow = (qhi >> jnp.uint32(32 - bd.nbits)).astype(jnp.int32) \
            >> (pack.bit_length() - 1)
        blo = jnp.clip(brow[::tile_q], 0, Bp - span)
        rows_t = pk.probe_sorted(qhi, qlo, blo,
                                 t1.reshape(Bp, stride * pack),
                                 bd.nbits, bd.cap, W, span=span, pack=pack,
                                 tile_q=tile_q)
        return rows_t, qhi, qlo, idxs, Q0

    @jax.jit
    def f_probe_noinv(p, m, t):
        rows_t, _qh, _ql, _ix, _Q0 = _probe_parts(p, m, t)
        return rows_t.sum(dtype=jnp.uint32)

    @jax.jit
    def f_bqs(p, m, t):
        canon, _ = pack_kmers_packed(p, m, L, k)
        rows = bucket_query_sorted(canon, t, bd.nbits, bd.cap, W)
        return rows.sum(dtype=jnp.uint32)

    @jax.jit
    def f_inv_scatter(p, m, t):
        """inverse permutation via scatter instead of 2-array sort
        (fixup omitted: its cost rides in both A and B of the sort-vs-
        scatter comparison via f_bqs - f_probe_noinv)."""
        rows_t, _qh, _ql, idxs, Q0 = _probe_parts(p, m, t)
        outs = []
        for w in range(W):
            o = jnp.zeros(idxs.shape[0], jnp.uint32).at[idxs].set(
                rows_t[w], mode="drop")
            outs.append(o[:Q0])
        return sum(o.sum(dtype=jnp.uint32) for o in outs)

    @jax.jit
    def f_gather(p, m, t):
        canon, _ = pack_kmers_packed(p, m, L, k)
        rows = bucket_query(canon, t, bd.nbits, bd.cap, W)
        return rows.sum(dtype=jnp.uint32)

    @jax.jit
    def f_v4(p, m, t):
        canon, _ = pack_kmers_packed(p, m, L, k)
        rows = bucket_query_sorted(canon, t, bd.nbits, bd.cap, W)
        data, pal, count, u = rle4_payload(rows, nbytes, pal_work)
        return (data.astype(jnp.uint32).sum() + pal.astype(jnp.uint32).sum()
                + count.astype(jnp.uint32) + u.astype(jnp.uint32))

    # ---- tail sub-stages (each = probe + a tail prefix; deltas between
    # consecutive programs isolate the scans / scatter / palette) ----
    from panagram_tpu.ops.anchor import _run_structure, rle_payload

    def _rows(p, m, t):
        canon, _ = pack_kmers_packed(p, m, L, k)
        return bucket_query_sorted(canon, t, bd.nbits, bd.cap, W)

    @jax.jit
    def f_runstruct(p, m, t):
        rows = _rows(p, m, t)
        change, count = _run_structure(rows)
        return (change.sum().astype(jnp.uint32)
                + count.astype(jnp.uint32) + rows.sum(dtype=jnp.uint32))

    @jax.jit
    def f_compact(p, m, t):
        from panagram_tpu.ops.anchor import _compact_runs

        rows = _rows(p, m, t)
        change, count = _run_structure(rows)
        delta_c, rmask = _compact_runs(rows, change, pal_work + 1)
        return (delta_c.astype(jnp.uint32).sum()
                + rmask.sum(dtype=jnp.uint32) + count.astype(jnp.uint32))

    @jax.jit
    def f_v3tail(p, m, t):
        rows = _rows(p, m, t)
        out, count = rle_payload(rows, nbytes, chunk)
        return out.astype(jnp.uint32).sum() + count.astype(jnp.uint32)

    run = lambda f: (lambda: np.asarray(f(packed_d, nmask_d, t1)))  # noqa: E731

    t_base = timed("base (input reduce)", run(f_base))
    t_pack = timed("pack", run(f_pack))
    t_sort = timed("pack+mix+fwd sort", run(f_sort))
    t_pnoi = timed("pack+sort+probe (no inverse)", run(f_probe_noinv))
    t_bqs = timed("pack+bucket_query_sorted", run(f_bqs))
    t_scat = timed("probe + scatter-inverse", run(f_inv_scatter))
    t_gath = timed("pack+gather probe", run(f_gather))
    t_v4 = timed("full v4 chunk (reduced)", run(f_v4))
    t_rs = timed("probe + run_structure", run(f_runstruct))
    t_cp = timed("probe + runstruct + compact", run(f_compact))
    t_v3t = timed("probe + v3 tail", run(f_v3tail))

    print("\n--- deltas ---")
    print(f"pack:                 {1e3*(t_pack-t_base):7.1f} ms")
    print(f"mix + fwd sort:       {1e3*(t_sort-t_pack):7.1f} ms")
    print(f"probe kernel:         {1e3*(t_pnoi-t_sort):7.1f} ms")
    print(f"fixup + inverse sort: {1e3*(t_bqs-t_pnoi):7.1f} ms")
    print(f"scatter-inv vs sort-inv: {1e3*(t_scat-t_pnoi):7.1f} vs "
          f"{1e3*(t_bqs-t_pnoi):7.1f} ms (no-fixup vs with-fixup)")
    print(f"gather-probe total:   {1e3*(t_gath-t_sort+t_sort-t_pack):7.1f}"
          f" ms (vs merge {1e3*(t_bqs-t_pack):7.1f})")
    print(f"v4 tail:              {1e3*(t_v4-t_bqs):7.1f} ms")
    print(f"  run_structure:      {1e3*(t_rs-t_bqs):7.1f} ms")
    print(f"  concat + scatter:   {1e3*(t_cp-t_rs):7.1f} ms")
    print(f"  palette stages:     {1e3*(t_v4-t_cp):7.1f} ms")
    print(f"v3 tail (for ref):    {1e3*(t_v3t-t_bqs):7.1f} ms")
    print(f"full v4:              {1e3*(t_v4-t_base):7.1f} ms "
          f"({chunk/ (t_v4-t_base) /1e6:.1f} Mkmers/s device)")


if __name__ == "__main__":
    main()
