"""Bucketed-hash dictionary lookup — the speed-of-light anchor path.

The reference's hot loop is KMC's per-position random access into its
prefix/suffix arrays (reference cpp/anchor.cpp:148 GetCountersForRead;
SURVEY §7.4.6 "sorted-array binary search has poor locality — prefer
bucketed/hashed layout with one HBM read per probe").  XLA's searchsorted
lowers to ~27 *dependent* narrow gathers; on TPU that is the dominant cost.

This module implements exactly the recommended design, tuned to the
measured TPU gather characteristics:

* keys pass through an invertible 64-bit mix (splitmix64 finalizer), so
  their high bits are uniform;
* the dictionary is ONE table of 2^b buckets, each a LANE-ALIGNED row of
  `stride` u32s (64 or a multiple — measured 2.5-3x faster to gather than
  odd widths) holding `cap` slots of (key_hi, key_lo, mask words);
* a query computes its bucket elementwise, gathers the row — a single
  wide HBM gather per probe — and compares against all slots in parallel
  (VPU);
* there is NO overflow structure: the builder retries with more buckets
  until every bucket fits its keys (splitmix-uniform loads make the retry
  loop terminate immediately in practice), so one gather resolves every
  query.  The cost is ~3x the raw key+mask bytes in padding.
"""

from __future__ import annotations

import dataclasses
import os
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


@dataclasses.dataclass
class BucketedDict:
    """Single-probe bucketed hash layout of a pan-kmer dictionary."""

    table: np.ndarray       # u32 [2^b, stride]
    nbits: int
    cap: int
    stride: int
    ngenomes: int
    k: int
    nwords: int

    MEAN_LOAD = 6

    @classmethod
    def build(cls, keys: np.ndarray, masks: np.ndarray, ngenomes: int,
              k: int, mixed: bool = False) -> "BucketedDict":
        """keys: distinct u64 canonical k-mers (any order); masks u32 [D, W].
        Set mixed=True when keys are already splitmix64-mixed."""
        D = max(len(keys), 1)
        W = masks.shape[1] if masks.ndim == 2 else 1
        masks = masks.reshape(len(keys), W)
        m = keys.astype(U64) if mixed else mix64_np(keys.astype(U64))
        if np.any(m == U64(0xFFFFFFFFFFFFFFFF)):
            raise RuntimeError("key mixes to the reserved all-ones value")

        slot_w = 2 + W
        # lane-aligned stride: smallest multiple of 64 u32 that fits a
        # safe capacity (>= 3x mean load so overflow is essentially never)
        stride = 64
        while stride // slot_w < 3 * cls.MEAN_LOAD:
            stride += 64
        cap = stride // slot_w

        nbits = max(int(np.ceil(np.log2(max(D / cls.MEAN_LOAD, 1)))), 2)
        for attempt in range(8):
            table, overflow = cls._layout(m, masks, nbits, cap, stride)
            if overflow == 0:
                return cls(table=table, nbits=nbits, cap=cap, stride=stride,
                           ngenomes=ngenomes, k=k, nwords=W)
            nbits += 1  # halve the mean load and retry
        raise RuntimeError("bucketed dict: bucket overflow persisted after "
                           "8 doublings — pathological key distribution")

    @staticmethod
    def _layout(mixed, masks, nbits, cap, stride):
        B = 1 << nbits
        W = masks.shape[1]
        slot_w = 2 + W
        bucket = (mixed >> U64(64 - nbits)).astype(np.int64)
        order = np.argsort(bucket, kind="stable")
        b_sorted = bucket[order]
        counts = np.bincount(b_sorted, minlength=B)
        overflow = int(np.maximum(counts - cap, 0).sum())
        if overflow:
            return None, overflow
        offsets = np.concatenate([[0], np.cumsum(counts)])[:-1]
        slot = np.arange(len(mixed)) - offsets[b_sorted]

        table = np.full((B, stride), _SENTINEL32, np.uint32)
        m_sorted = mixed[order]
        rows = np.empty((len(mixed), slot_w), np.uint32)
        rows[:, 0] = (m_sorted >> U64(32)).astype(np.uint32)
        rows[:, 1] = (m_sorted & U64(0xFFFFFFFF)).astype(np.uint32)
        rows[:, 2:] = masks[order]
        view = table[:, : cap * slot_w].reshape(B, cap, slot_w)
        view[b_sorted, slot] = rows
        return table, 0

    def device_arrays(self):
        return (jnp.asarray(self.table),)

    @classmethod
    def build_device(cls, keys, masks, ngenomes: int, k: int,
                     mixed: bool = False, count: int | None = None,
                     min_nbits: int = 2) -> "BucketedDict":
        """Device-side layout: same result as build() but the argsort +
        scatter run on the accelerator and `table` stays a device array —
        no host round-trip of the table (SURVEY §7.4.2 scale requirement).

        keys may be SENTINEL-padded (e.g. the device-resident builder's
        fixed-capacity arrays); `count` is the number of real keys (for
        sizing only; defaults to len(keys))."""
        D = max(int(count) if count is not None else len(keys), 1)
        W = masks.shape[1] if masks.ndim == 2 else 1
        keys = jnp.asarray(keys, jnp.uint64)
        masks = jnp.asarray(masks, jnp.uint32).reshape(keys.shape[0], W)
        m = keys if mixed else jnp.where(
            keys == U64(0xFFFFFFFFFFFFFFFF), keys, mix64(keys))

        slot_w = 2 + W
        stride = 64
        while stride // slot_w < 3 * cls.MEAN_LOAD:
            stride += 64
        cap = stride // slot_w

        nbits = max(int(np.ceil(np.log2(max(D / cls.MEAN_LOAD, 1)))),
                    min_nbits)
        for _ in range(8):
            table, overflow = _layout_device(m, masks, nbits, cap, stride)
            if int(overflow) == 0:
                return cls(table=table, nbits=nbits, cap=cap, stride=stride,
                           ngenomes=ngenomes, k=k, nwords=W)
            nbits += 1
        raise RuntimeError("bucketed dict: bucket overflow persisted after "
                           "8 doublings — pathological key distribution")


def layout_rows(m: jax.Array, masks: jax.Array, bucket: jax.Array,
                n_buckets: int, cap: int, stride: int):
    """Traced core of the device bucket layout (also used inside the
    distributed build's shard_map body, parallel/shard.py).

    m u64 [D] mixed keys (SENTINEL rows are padding and dropped); masks
    u32 [D, W]; bucket i32 [D] — the destination bucket of each row (any
    derivation: top bits, low bits, shard-offset).

    Returns (table u32 [n_buckets, stride], overflow i32): rows beyond a
    bucket's capacity are dropped and counted in overflow (the caller
    retries with more buckets)."""
    D = m.shape[0]
    W = masks.shape[1]
    slot_w = 2 + W

    real = m != jnp.uint64(0xFFFFFFFFFFFFFFFF)
    b = jnp.where(real, bucket, n_buckets).astype(jnp.int32)

    # deterministic grouping: sort by (bucket, key) — keys are distinct,
    # so the order (hence slot assignment) is a fixed total order
    ops = (b, m) + tuple(masks[:, w] for w in range(W))
    srt = jax.lax.sort(ops, num_keys=2)
    bs, ms = srt[0], srt[1]
    masks_s = jnp.stack(srt[2:], axis=1) if W else masks

    counts = jnp.bincount(bs, length=n_buckets + 1)
    offsets = jnp.cumsum(counts) - counts
    slot = jnp.arange(D) - offsets[bs]
    overflow = jnp.sum(jnp.maximum(counts[:n_buckets] - cap, 0))

    ok = (bs < n_buckets) & (slot < cap)
    base = jnp.where(ok, bs * stride + slot * slot_w, n_buckets * stride)
    idx = base[:, None] + jnp.arange(slot_w)[None, :]
    vals = jnp.concatenate(
        [
            (ms >> U64(32)).astype(jnp.uint32)[:, None],
            (ms & U64(0xFFFFFFFF)).astype(jnp.uint32)[:, None],
            masks_s,
        ],
        axis=1,
    )
    table = jnp.full(n_buckets * stride, _SENTINEL32, jnp.uint32)
    table = table.at[idx].set(vals, mode="drop")
    return table.reshape(n_buckets, stride), overflow.astype(jnp.int32)


@partial(jax.jit, static_argnums=(2, 3, 4))
def _layout_device(m: jax.Array, masks: jax.Array, nbits: int, cap: int,
                   stride: int):
    bucket = (m >> U64(64 - nbits)).astype(jnp.int32)
    return layout_rows(m, masks, bucket, 1 << nbits, cap, stride)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def bucket_query(canon: jax.Array, table: jax.Array,
                 nbits: int, cap: int, nwords: int,
                 pre_mixed: bool = False):
    """canon u64 [Q] -> mask rows u32 [Q, W] in ONE wide gather.  Misses
    (including SENTINEL / invalid windows) return zero masks, matching
    KMC's counter-0 behaviour for absent or N-containing k-mers."""
    m = canon.astype(jnp.uint64) if pre_mixed else mix64(canon)
    qhi = (m >> U64(32)).astype(jnp.uint32)
    qlo = (m & U64(0xFFFFFFFF)).astype(jnp.uint32)
    bucket = (m >> U64(64 - nbits)).astype(jnp.int32)

    rows = jnp.take(table, bucket, axis=0)            # [Q, stride]
    slot_w = 2 + nwords
    rows = rows[:, : cap * slot_w].reshape(rows.shape[0], cap, slot_w)
    hit = (rows[:, :, 0] == qhi[:, None]) & (rows[:, :, 1] == qlo[:, None])
    # empty slots are hi=lo=0xFFFFFFFF; exclude the (single, astronomically
    # unlikely) all-ones mixed value from matching
    hit = hit & (m != U64(0xFFFFFFFFFFFFFFFF))[:, None]
    sel = jnp.where(hit[:, :, None], rows[:, :, 2:], jnp.uint32(0))
    return sel.sum(axis=1, dtype=jnp.uint32)


@partial(jax.jit, static_argnums=(2, 3, 4, 5))
def bucket_query_sorted(canon: jax.Array, table: jax.Array,
                        nbits: int, cap: int, nwords: int,
                        pre_mixed: bool = False):
    """Merge-probe variant of bucket_query (identical results).

    Sort the queries by mixed key, then stream the table HBM->VMEM in
    contiguous bucket slices (Pallas double-buffered DMA, pallas_kernels
    .probe_sorted) instead of issuing one random wide gather per query —
    the sequential-read pattern runs at HBM bandwidth where the gather is
    issue-rate-bound (~1% of roofline; ROUND1_NOTES.md).  The sort and the
    inverse permutation are radix sorts (~11 ms / 4M keys measured), both
    far cheaper than the gather they replace.

    Correctness is unconditional: a per-tile bucket-span check (can tile t
    see all its buckets inside [blo[t], blo[t]+span)?) selects the Pallas
    path only when the geometry holds — lax.cond falls back to the gather
    probe otherwise (rare: span violations need ~TILE_Q consecutive sorted
    queries to straddle > span buckets)."""
    from . import pallas_kernels as pk

    Q0 = canon.shape[0]
    B = 1 << nbits
    stride = table.shape[1]
    # Mosaic VMEM slices must be 128-lane aligned: pack adjacent buckets
    # into one DMA row until the row width is a multiple of 128 u32 (the
    # kernel safely matches across all packed buckets — an exact (hi, lo)
    # match in a neighbour bucket is impossible since equal hi implies the
    # same bucket)
    pack = 1
    while (stride * pack) % 128 or B % pack:
        pack *= 2
    Bp = B // pack
    m0 = canon.astype(jnp.uint64) if pre_mixed else mix64(canon)
    ALL1 = U64(0xFFFFFFFFFFFFFFFF)
    Qp = -(-Q0 // pk.TILE_Q) * pk.TILE_Q

    # bucket-slice height (packed rows per tile): the one-hot row-select
    # matmul scales with span, so size it to the geometry — a tile of
    # TILE_Q sorted uniform queries covers TILE_Q*Bp/Qp rows on average
    # with ~sqrt(TILE_Q) fluctuation; 4x the mean is a >100-sigma margin
    # (the cond fallback still guarantees correctness).  Cap by VMEM
    # scratch (~4 MB for 2 buffers) and floor at 256 rows.
    expect = max(pk.TILE_Q * Bp // Qp, 1)
    span = min(pk.SPAN, Bp, max((1 << 19) // (stride * pack), 256),
               max(4 * expect, 256))
    env_span = os.environ.get("PANAGRAM_TPU_PROBE_SPAN")
    if env_span:
        span = min(int(env_span), Bp)
    m = m0 if Qp == Q0 else jnp.concatenate(
        [m0, jnp.full(Qp - Q0, ALL1, jnp.uint64)])

    idx = jnp.arange(Qp, dtype=jnp.int32)
    ms, idxs = jax.lax.sort((m, idx), num_keys=1)
    brow = ((ms >> U64(64 - nbits)).astype(jnp.int32)
            >> (pack.bit_length() - 1))
    blo = jnp.clip(brow[:: pk.TILE_Q], 0, Bp - span)
    # padding / reserved all-ones keys never hit (kernel masks them), so
    # they are exempt from the span requirement
    inspan = (brow - jnp.repeat(blo, pk.TILE_Q) < span) | (ms == ALL1)
    ok = jnp.all(inspan)

    qhi = (ms >> U64(32)).astype(jnp.uint32)
    qlo = (ms & U64(0xFFFFFFFF)).astype(jnp.uint32)

    def fast(_):
        rows_t = pk.probe_sorted(qhi, qlo, blo,
                                 table.reshape(Bp, stride * pack),
                                 nbits, cap, nwords, span=span, pack=pack)
        # inverse permutation by sorting on the original index (sort-based
        # permute: a gather here would reintroduce the issue-rate wall)
        srt = jax.lax.sort((idxs,) + tuple(rows_t[w] for w in range(nwords)),
                           num_keys=1)
        return jnp.stack(srt[1:], axis=1)[:Q0]

    def slow(_):
        return bucket_query(canon, table, nbits, cap, nwords, pre_mixed)

    return jax.lax.cond(ok, fast, slow, None)
