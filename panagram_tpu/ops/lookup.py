"""Bucketed-hash dictionary lookup — the speed-of-light anchor path.

The reference's hot loop is KMC's per-position random access into its
prefix/suffix arrays (reference cpp/anchor.cpp:148 GetCountersForRead;
SURVEY §7.4.6 "sorted-array binary search has poor locality — prefer
bucketed/hashed layout with one HBM read per probe").  XLA's searchsorted
lowers to ~27 *dependent* narrow gathers; on TPU that is the dominant cost.

This module replaces it with exactly the recommended design:

* keys are passed through an invertible 64-bit mix (splitmix64 finalizer),
  so their high bits are uniform;
* the dictionary is laid out as 2^b buckets of `cap` slots, each slot
  holding (key_hi, key_lo, mask words) as consecutive u32s — one bucket row
  is ONE wide HBM gather;
* a query computes its bucket elementwise, gathers the row, and compares
  against all slots in parallel (VPU);  keys that overflowed their bucket
  live in a second, re-hashed bucket table (two wide gathers total, no
  data-dependent loops).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

U64 = np.uint64
_SENTINEL32 = np.uint32(0xFFFFFFFF)

_M1 = U64(0xBF58476D1CE4E5B9)
_M2 = U64(0x94D049BB133111EB)


def mix64_np(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (invertible on u64)."""
    x = x.astype(U64, copy=True)
    x ^= x >> U64(30)
    x *= _M1
    x ^= x >> U64(27)
    x *= _M2
    x ^= x >> U64(31)
    return x


def mix64(x: jax.Array) -> jax.Array:
    x = x.astype(jnp.uint64)
    x = x ^ (x >> U64(30))
    x = x * _M1
    x = x ^ (x >> U64(27))
    x = x * _M2
    x = x ^ (x >> U64(31))
    return x


def _layout(mixed: np.ndarray, masks: np.ndarray, nbits: int, cap: int):
    """Scatter (mixed_key, mask) rows into a [2^b, cap*(2+W)] u32 table.
    Returns (table, overflow_mixed, overflow_masks)."""
    B = 1 << nbits
    W = masks.shape[1]
    stride = 2 + W
    bucket = (mixed >> U64(64 - nbits)).astype(np.int64)
    order = np.argsort(bucket, kind="stable")
    b_sorted = bucket[order]
    counts = np.bincount(b_sorted, minlength=B)
    offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
    slot = np.arange(len(mixed)) - offsets[b_sorted]

    table = np.full((B, cap * stride), _SENTINEL32, np.uint32)
    ok = slot < cap
    rows = np.empty((len(mixed), stride), np.uint32)
    m_sorted = mixed[order]
    rows[:, 0] = (m_sorted >> U64(32)).astype(np.uint32)
    rows[:, 1] = (m_sorted & U64(0xFFFFFFFF)).astype(np.uint32)
    rows[:, 2:] = masks[order]
    flat = table.reshape(B, cap, stride)
    flat[b_sorted[ok], slot[ok]] = rows[ok]

    ov = ~ok
    return table, m_sorted[ov], masks[order][ov]


@dataclasses.dataclass
class BucketedDict:
    """Two-level bucketed hash layout of a pan-kmer dictionary."""

    table: np.ndarray       # u32 [2^b, cap*(2+W)]
    table2: np.ndarray      # u32 [2^b2, cap2*(2+W)] (overflow, rehash)
    nbits: int
    nbits2: int
    cap: int
    cap2: int
    ngenomes: int
    k: int
    nwords: int

    MEAN_LOAD = 6
    LEVEL2_MEAN = 4
    CAP = 12

    @classmethod
    def build(cls, keys: np.ndarray, masks: np.ndarray, ngenomes: int, k: int,
              mixed: bool = False) -> "BucketedDict":
        """keys: distinct u64 canonical k-mers (any order); masks u32 [D, W].
        Set mixed=True when keys are already splitmix64-mixed."""
        D = max(len(keys), 1)
        W = masks.shape[1] if masks.ndim == 2 else 1
        masks = masks.reshape(len(keys), W)
        m = keys.astype(U64) if mixed else mix64_np(keys.astype(U64))
        if np.any(m == U64(0xFFFFFFFFFFFFFFFF)):
            raise RuntimeError("key mixes to the reserved all-ones value")

        nbits = max(int(np.ceil(np.log2(max(D / cls.MEAN_LOAD, 1)))), 2)
        table, ov_m, ov_masks = _layout(m, masks, nbits, cls.CAP)

        # overflow level: rehash (one more mix round) into its own table
        O = max(len(ov_m), 1)
        nbits2 = max(int(np.ceil(np.log2(max(O / cls.LEVEL2_MEAN, 1)))), 2)
        table2, ov2_m, _ = _layout(mix64_np(ov_m), ov_masks, nbits2, cls.CAP)
        if len(ov2_m):
            raise RuntimeError(
                f"bucketed dict: {len(ov2_m)} keys overflowed both levels; "
                "increase CAP"
            )
        return cls(table=table, table2=table2, nbits=nbits, nbits2=nbits2,
                   cap=cls.CAP, cap2=cls.CAP, ngenomes=ngenomes, k=k,
                   nwords=W)

    def device_arrays(self):
        return jnp.asarray(self.table), jnp.asarray(self.table2)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def bucket_query(canon: jax.Array, table: jax.Array, table2: jax.Array,
                 nbits: int, nbits2: int, cap: int, nwords: int,
                 pre_mixed: bool = False):
    """canon u64 [Q] -> mask rows u32 [Q, W].  Misses (including SENTINEL /
    invalid windows) return zero masks, matching KMC's counter-0 behaviour
    for absent or N-containing k-mers."""
    m = canon.astype(jnp.uint64) if pre_mixed else mix64(canon)

    def probe(tab, mm, bits, bucket_mask=None):
        # mm is the value the table level was laid out with; empty slots are
        # hi=lo=0xFFFFFFFF, so exclude the (single, astronomically unlikely)
        # all-ones value from matching.
        qhi = (mm >> U64(32)).astype(jnp.uint32)
        qlo = (mm & U64(0xFFFFFFFF)).astype(jnp.uint32)
        bucket = (mm >> U64(64 - bits)).astype(jnp.int32)
        if bucket_mask is not None:
            # level-1 hits re-read bucket 0: the fetch stays in cache instead
            # of a random HBM row, so the overflow level costs ~nothing for
            # the ~100% of queries resolved at level 1
            bucket = jnp.where(bucket_mask, jnp.int32(0), bucket)
        rows = jnp.take(tab, bucket, axis=0)           # [Q, cap*(2+W)] wide gather
        rows = rows.reshape(rows.shape[0], cap, 2 + nwords)
        hit = (rows[:, :, 0] == qhi[:, None]) & (rows[:, :, 1] == qlo[:, None])
        hit = hit & (mm != U64(0xFFFFFFFFFFFFFFFF))[:, None]
        sel = jnp.where(hit[:, :, None], rows[:, :, 2:], jnp.uint32(0))
        return sel.sum(axis=1, dtype=jnp.uint32), hit.any(axis=1)

    out1, hit1 = probe(table, m, nbits)
    out2, _ = probe(table2, mix64(m), nbits2, bucket_mask=hit1)
    return jnp.where(hit1[:, None], out1, out2)
