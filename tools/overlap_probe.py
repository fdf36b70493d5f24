"""Does the axon tunnel overlap d2h copies with device compute?

Measures three walls over the SAME fused anchor chunk program:
  A. compute only               (dispatch -> block_until_ready)
  B. d2h only                   (async piece copies of a resident buffer)
  C. compute(i+1) dispatched BEFORE reading d2h(i)   (the pipeline order)

If C ~= A + B the tunnel serializes transfers with compute and the e2e
ceiling is 1/(compute+transfer) regardless of host-side threading; if
C ~= max(A, B) they overlap and pipelining can reach the compute rate.
Run with the TPU tunnel attached (NOT under pytest's cpu guard).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import panagram_tpu  # noqa: F401
    from panagram_tpu.ops.anchor import (
        anchor_chunk_rle4,
        dispatch_rle4_prefix,
        pack_bases_combined,
        pal_work_for,
        rle_proto,
    )
    from panagram_tpu.ops.lookup import BucketedDict
    from panagram_tpu.ops.ref_impl import build_dict_np, canonical_kmers_np

    k = 21
    ngenomes = 30
    chunk = 1 << 22
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
    for g in range(ngenomes):
        mut = founders[g % 4].copy()
        pos = rng.choice(glen, glen // 1000, replace=False)
        mut[pos] = rng.integers(0, 4, len(pos), dtype=np.uint8)
        canon, valid = canonical_kmers_np(mut, k)
        sets.append(np.unique(canon[valid]))
    keys, masks = build_dict_np(sets)
    bd = BucketedDict.build(keys, masks, ngenomes, k)
    (t1,) = bd.device_arrays()
    nbytes = (ngenomes + 7) // 8
    assert rle_proto(nbytes) == 4
    pal_work = pal_work_for(chunk)

    codes = np.tile(founders[0], -(-((chunk + k - 1)) // glen))[: chunk + k - 1]
    inbuf, L = pack_bases_combined(codes)
    ib = jnp.asarray(inbuf)
    jax.block_until_ready(ib)

    def compute(ibuf):
        return anchor_chunk_rle4(ibuf, t1, L, k, bd.nbits, bd.cap,
                                 bd.nwords, nbytes, pal_work)

    out = compute(ib)
    jax.block_until_ready(out)
    count = int(np.asarray(out[1])[0, :4].copy().view("<u4")[0])
    hint, pal_hint = count, int(np.asarray(out[1])[1, :4].copy().view("<u4")[0])
    print(f"count={count} pal={pal_hint}", file=sys.stderr)

    def read_pieces(o):
        prefix = dispatch_rle4_prefix(o[0], o[1], hint, pal_hint)
        dp, pp = prefix
        for _sa, arr in pp + dp:
            np.asarray(arr)

    reps = 6

    # A: compute only
    ta = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        o = compute(ib)
        jax.block_until_ready(o)
        ta = min(ta, time.perf_counter() - t0)

    # B: d2h only (resident output from the warm call)
    tb = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        read_pieces(out)
        tb = min(tb, time.perf_counter() - t0)

    # C: dispatch next compute, then read previous result's pieces
    tc = 1e9
    prev = out
    for _ in range(reps):
        t0 = time.perf_counter()
        o = compute(ib)
        read_pieces(prev)
        jax.block_until_ready(o)
        tc = min(tc, time.perf_counter() - t0)
        prev = o

    # D: h2d only
    td = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jnp.asarray(inbuf)
        jax.block_until_ready(x)
        td = min(td, time.perf_counter() - t0)

    # E: full pipeline step (h2d + compute + read prev)
    te = 1e9
    prev = out
    for _ in range(reps):
        t0 = time.perf_counter()
        x = jnp.asarray(inbuf)
        o = compute(x)
        read_pieces(prev)
        jax.block_until_ready(o)
        te = min(te, time.perf_counter() - t0)
        prev = o

    print(f"A compute-only      {1e3*ta:7.1f} ms")
    print(f"B d2h pieces only   {1e3*tb:7.1f} ms")
    print(f"C compute||d2h      {1e3*tc:7.1f} ms  (A+B={1e3*(ta+tb):.1f}, "
          f"max={1e3*max(ta,tb):.1f})")
    print(f"D h2d only          {1e3*td:7.1f} ms")
    print(f"E h2d+compute+d2h   {1e3*te:7.1f} ms  (A+B+D={1e3*(ta+tb+td):.1f})")


if __name__ == "__main__":
    main()
