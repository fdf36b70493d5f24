"""Anchoring: streamed dictionary lookup + popcount + histograms.

TPU-native replacement for the reference's hot path (cpp/anchor.cpp:112-195:
GetCountersForRead -> byte-pack -> __builtin_popcount -> occupancy
histogram): each anchor position's canonical k-mer is looked up in the
sorted dictionary (vectorized binary search), the presence-mask row is
gathered, and popcounts / per-genome column sums / per-bin occupancy
histograms are fused reductions over the same pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .codec import SENTINEL, pack_kmers


def _query(canon, table, nbits: int, cap: int, nwords: int):
    """Dictionary probe used by every anchor_chunk_* kernel.

    PANAGRAM_TPU_PALLAS=1 selects the Pallas merge probe
    (lookup.bucket_query_sorted: sort + streamed table DMA) over the wide
    random gather.  The flag is read at TRACE time — flipping it after a
    chunk shape has compiled keeps the cached program (acceptable: the env
    is process-lifetime configuration, set before the pipeline starts)."""
    from .lookup import bucket_query, bucket_query_sorted
    from .pallas_kernels import pallas_enabled

    if pallas_enabled():
        return bucket_query_sorted(canon, table, nbits, cap, nwords)
    return bucket_query(canon, table, nbits, cap, nwords)


@jax.jit
def anchor_lookup(canon: jax.Array, keys: jax.Array, masks: jax.Array):
    """canon u64 [P]; keys u64 [D] sorted (may be SENTINEL-padded);
    masks u32 [D, W].  Returns mask rows u32 [P, W] (0 for misses)."""
    D = keys.shape[0]
    idx = jnp.searchsorted(keys, canon)
    idx_c = jnp.clip(idx, 0, D - 1)
    hit = (keys[idx_c] == canon) & (canon != SENTINEL)
    rows = jnp.take(masks, idx_c, axis=0)
    return jnp.where(hit[:, None], rows, jnp.uint32(0))


@jax.jit
def mask_popcount(rows: jax.Array) -> jax.Array:
    """Popcount across mask words -> occupancy per position (int32 [P]).
    The explicit accumulator dtype stops jnp.sum promoting to int64 under
    the package's x64 mode (scattering int64 into int32 buffers warns now
    and will become an error)."""
    return jnp.sum(jax.lax.population_count(rows).astype(jnp.int32), axis=-1,
                   dtype=jnp.int32)


@jax.jit
def masks_to_bytes(rows: jax.Array) -> jax.Array:
    """u32 [P, W] -> little-endian uint8 [P, 4W].  The caller truncates to
    nbytes = ceil(N/8) columns, reproducing the reference's per-DB byte
    slice layout (panagram/index.py:937-947, cpp/anchor.cpp:138-165)."""
    P, W = rows.shape
    shifts = np.array([0, 8, 16, 24], np.uint32)
    b = (rows[:, :, None] >> shifts[None, None, :]) & jnp.uint32(0xFF)
    return b.astype(jnp.uint8).reshape(P, 4 * W)


def _colsum_list(rows: jax.Array, n: int) -> jax.Array:
    """Per-genome presence totals over the first n bits (int64 [n]).

    One vectorized pass: bitcast the mask words to little-endian bytes,
    broadcast-unpack all bits at once, and reduce over positions — not a
    per-genome Python loop of n separate reductions."""
    P, W = rows.shape
    by = jax.lax.bitcast_convert_type(rows, jnp.uint8)       # [P, W, 4] LE
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (by[:, :, :, None] >> shifts) & jnp.uint8(1)      # [P, W, 4, 8]
    sums = jnp.sum(bits.reshape(P, 32 * W).astype(jnp.int32), axis=0)
    return sums[:n].astype(jnp.int64)


@partial(jax.jit, static_argnums=(1,))
def genome_column_sums(rows: jax.Array, ngenomes: int) -> jax.Array:
    """Per-genome presence totals over positions (int64 [N]) — the
    paircount_sums of reference index.py:1051."""
    return _colsum_list(rows, ngenomes)


@partial(jax.jit, static_argnums=(1, 2, 3))
def occupancy_histogram(popc: jax.Array, binlen: int, nbins: int, ngenomes: int):
    """Per-bin occupancy histogram: [nbins, N+1] counts of positions whose
    popcount == occ (reference cpp/anchor.cpp:179-189, index.py:1169-1183).
    popc is int32 [P] where P <= nbins*binlen; pad entries must carry
    popc == -1 (ignored)."""
    P = popc.shape[0]
    bins = (jnp.arange(P) // binlen).astype(jnp.int32)
    ok = popc >= 0
    flat = jnp.where(ok, bins * (ngenomes + 1) + popc, nbins * (ngenomes + 1))
    hist = jnp.zeros(nbins * (ngenomes + 1) + 1, jnp.int32).at[flat].add(1)
    return hist[:-1].reshape(nbins, ngenomes + 1)


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8))
def anchor_chunk_fast(packed: jax.Array, nmask: jax.Array,
                      table: jax.Array,
                      L: int, k: int, nbits: int, cap: int,
                      nwords: int, nbytes: int):
    """Fused fast path: packed 2-bit codes -> bitmap bytes (device-sliced to
    nbytes) + popcounts + per-genome totals, using the bucketed-hash lookup
    (ops/lookup.py) instead of binary search.

    Minimises host<->device traffic: input is 0.375 B/base, outputs are
    nbytes/position + tiny reductions (SURVEY §7.4.5)."""
    from .codec import unpack_bases

    codes = unpack_bases(packed, nmask, L)
    canon, _ = pack_kmers(codes, k)
    rows = _query(canon, table, nbits, cap, nwords)
    popc = mask_popcount(rows)
    by = masks_to_bytes(rows)[:, :nbytes]
    colsums = _colsum_list(rows, 32 * nwords)
    return by, popc, colsums


@partial(jax.jit, static_argnums=(3, 4, 5, 6, 7, 8, 9))
def anchor_chunk_rle(packed: jax.Array, nmask: jax.Array,
                     table: jax.Array,
                     L: int, k: int, nbits: int, cap: int,
                     nwords: int, nbytes: int, capacity: int):
    """Fast path with run-length-compacted output.

    Consecutive anchor positions usually share their presence mask (runs
    break only at variant boundaries), so instead of shipping nbytes per
    position over a narrow host link, ship only the rows where the mask
    CHANGES: (positions i32 [capacity], bytes u8 [capacity, nbytes],
    popc i32 [capacity], stats i64 [32*nwords + 1] = per-genome column
    sums with the change count in the last slot).  The host reconstructs
    with np.repeat (rle_expand below).  If count > capacity the caller
    falls back to anchor_chunk_fast.
    """
    from .codec import unpack_bases

    codes = unpack_bases(packed, nmask, L)
    canon, _ = pack_kmers(codes, k)
    rows = _query(canon, table, nbits, cap, nwords)
    P = rows.shape[0]
    popc = mask_popcount(rows)
    by = masks_to_bytes(rows)[:, :nbytes]

    change = jnp.concatenate([
        jnp.ones(1, bool), jnp.any(rows[1:] != rows[:-1], axis=1)
    ])
    pos = jnp.cumsum(change.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    slots = jnp.where(change & (pos < capacity), pos, capacity)

    iota = jnp.arange(P, dtype=jnp.int32)
    out_pos = jnp.zeros(capacity + 1, jnp.int32).at[slots].set(
        iota, mode="drop", unique_indices=False)
    out_bytes = jnp.zeros((capacity + 1, nbytes), jnp.uint8).at[slots].set(
        by, mode="drop")
    out_popc = jnp.zeros(capacity + 1, jnp.int32).at[slots].set(
        popc, mode="drop")

    # stats = [colsums..., count] in ONE array: a single host transfer
    stats = jnp.concatenate([_colsum_list(rows, 32 * nwords),
                             count[None].astype(jnp.int64)])

    return (out_pos[:capacity], out_bytes[:capacity], out_popc[:capacity],
            stats)


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def anchor_chunk_rle2(inbuf: jax.Array, table: jax.Array,
                      L: int, k: int, nbits: int, cap: int,
                      nwords: int, nbytes: int, capacity: int):
    """Transfer-optimal fast path: ONE u8 input buffer (packed bases ++
    N-mask, from pack_bases_combined) and ONE u8 output buffer per chunk.

    Output row i (i < count): [pos u32 LE | popc u16 LE | mask bytes].
    Returns (combined u8 [capacity, 6 + nbytes], count i64 [1]).
    Host side: unpack_rle2 reconstructs full-resolution rows and
    rle2_colsums the per-genome totals.
    """
    from .codec import unpack_bases

    n4 = (L + 3) // 4
    packed = jax.lax.slice(inbuf, (0,), (n4,))
    nmask = jax.lax.slice(inbuf, (n4,), (inbuf.shape[0],))
    codes = unpack_bases(packed, nmask, L)
    canon, _ = pack_kmers(codes, k)
    rows = _query(canon, table, nbits, cap, nwords)
    P = rows.shape[0]
    popc = mask_popcount(rows)
    by = masks_to_bytes(rows)[:, :nbytes]

    change = jnp.concatenate([
        jnp.ones(1, bool), jnp.any(rows[1:] != rows[:-1], axis=1)
    ])
    pos = jnp.cumsum(change.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    slots = jnp.where(change & (pos < capacity), pos, capacity)

    iota = jnp.arange(P, dtype=jnp.uint32)
    shifts = np.array([0, 8, 16, 24], np.uint32)
    pos_bytes = ((iota[:, None] >> shifts[None, :]) & 0xFF).astype(jnp.uint8)
    popc_bytes = jnp.stack(
        [(popc & 0xFF).astype(jnp.uint8), ((popc >> 8) & 0xFF).astype(jnp.uint8)],
        axis=1,
    )
    payload = jnp.concatenate([pos_bytes, popc_bytes, by], axis=1)
    out = jnp.zeros((capacity + 1, 6 + nbytes), jnp.uint8).at[slots].set(
        payload, mode="drop")

    # no device-side column sums: the host derives exact per-genome totals
    # from the RLE rows x run lengths (rle2_colsums below) — dropping 32W
    # reduction passes over the full row array
    stats = count[None].astype(jnp.int64)
    return out[:capacity], stats


def pack_bases_combined(codes: np.ndarray):
    """Host-side single-buffer companion of pack_bases_np: returns
    (inbuf u8 [ceil(L/4) + ceil(L/8)], L)."""
    from .codec import pack_bases_np

    packed, nmask, L = pack_bases_np(codes)
    return np.concatenate([packed, nmask]), L


def unpack_rle2(combined_host: np.ndarray, count: int, total: int,
                nbytes: int):
    """Host-side decode of anchor_chunk_rle2 output (already np.asarray'd
    and sliced to >= count rows): returns (bytes [total, nbytes],
    popc [total])."""
    rowsc = combined_host[:count]
    pos = rowsc[:, :4].copy().view("<u4").reshape(-1).astype(np.int64)
    popc = rowsc[:, 4:6].copy().view("<u2").reshape(-1).astype(np.int32)
    by = rowsc[:, 6:]
    reps = np.diff(pos, append=total)
    return np.repeat(by, reps, axis=0), np.repeat(popc, reps)


def rle2_colsums(combined_host: np.ndarray, count: int, total: int,
                 ngenomes: int) -> np.ndarray:
    """Exact per-genome presence totals from RLE rows x run lengths —
    host-side replacement for the device column-sum reductions (the
    paircount_sums of reference index.py:1051).  `total` must be the REAL
    position count (padding rows are zero anyway)."""
    rowsc = combined_host[:count]
    pos = rowsc[:, :4].copy().view("<u4").reshape(-1).astype(np.int64)
    reps = np.diff(pos, append=total).clip(min=0)
    bits = np.unpackbits(rowsc[:, 6:], axis=1, bitorder="little")[:, :ngenomes]
    return (bits.astype(np.int64) * reps[:, None]).sum(axis=0)


RLE_PREFIX = 1 << 17  # rows speculatively transferred with the kernel


def dispatch_rle_prefix(combined: jax.Array):
    """Queue a fixed-size prefix transfer of the RLE buffer immediately
    after the kernel dispatch: by the time the host learns `count` (the
    stats sync), the typical-case payload is already on its way — one
    serialized round trip less per chunk.  Falls back to _pow2_slice when
    count exceeds the prefix."""
    n = min(RLE_PREFIX, combined.shape[0])
    return combined[:n]


def collect_rle(prefix: jax.Array, combined: jax.Array, count: int):
    """Host-side: materialise >= count RLE rows using the speculative
    prefix when it suffices."""
    if count <= prefix.shape[0]:
        return np.asarray(prefix)[:count]
    return _pow2_slice(combined, count)


def _pow2_slice(arr, count: int):
    """Device-slice to the next power of two >= count: bounds the number of
    distinct compiled slice programs to log2(capacity) instead of one per
    observed count (device slicing by arbitrary python ints would trigger a
    fresh XLA compile per shape)."""
    n = arr.shape[0]
    c = 1
    while c < count:
        c <<= 1
    c = min(c, n)
    return np.asarray(arr[:c])[:count]


def rle_expand(positions: np.ndarray, values: np.ndarray, count: int,
               total: int) -> np.ndarray:
    """Host-side inverse of anchor_chunk_rle's compaction."""
    positions = _pow2_slice(positions, count)
    reps = np.diff(positions, append=total)
    return np.repeat(_pow2_slice(values, count), reps, axis=0)


@partial(jax.jit, static_argnums=(3,))
def anchor_chunk(codes: jax.Array, keys: jax.Array, masks: jax.Array, k: int):
    """Fused anchor step over one (k-1)-halo'd sequence chunk:
    codes u8 [CH + k - 1] -> (bytes u8 [CH, 4W], popc i32 [CH],
    colsum contribution i64 [N-words*32 via genome_column_sums done by
    caller], valid mask).

    Returns (rows u32 [CH, W], popc i32 [CH]).  Byte-packing and column
    sums are separate jitted calls so XLA can still fuse what it wants
    while keeping the output set flexible.
    """
    canon, _ = pack_kmers(codes, k)
    rows = anchor_lookup(canon, keys, masks)
    popc = mask_popcount(rows)
    return rows, popc
