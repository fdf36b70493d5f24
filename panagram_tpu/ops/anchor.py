"""Anchoring: streamed dictionary lookup + popcount + histograms.

TPU-native replacement for the reference's hot path (cpp/anchor.cpp:112-195:
GetCountersForRead -> byte-pack -> __builtin_popcount -> occupancy
histogram): each anchor position's canonical k-mer is looked up in the
sorted dictionary (vectorized binary search), the presence-mask row is
gathered, and popcounts / per-genome column sums / per-bin occupancy
histograms are fused reductions over the same pass.
"""

from __future__ import annotations

import os
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

    Eight fused shift+mask+sum passes over the byte view — memory-bounded
    at one [P, 4W] u8 temp per pass (a full broadcast-unpack would
    materialise [P, 32W], which aborted the 8-virtual-device CPU mesh at
    the 4M-position chunk; a per-genome loop would make n passes)."""
    P, W = rows.shape
    by = jax.lax.bitcast_convert_type(rows, jnp.uint8)       # [P, W, 4] LE
    byf = by.reshape(P, 4 * W)
    cols = [jnp.sum(((byf >> jnp.uint8(b)) & jnp.uint8(1)).astype(jnp.int32),
                    axis=0) for b in range(8)]               # 8 x [4W]
    sums = jnp.stack(cols, axis=1).reshape(32 * W)           # g = byte*8+bit
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
    from .codec import pack_kmers_packed

    canon, _ = pack_kmers_packed(packed, nmask, L, k)
    rows = _query(canon, table, nbits, cap, nwords)
    popc = mask_popcount(rows)
    by = masks_to_bytes(rows)[:, :nbytes]
    colsums = _colsum_list(rows, 32 * nwords)
    return by, popc, colsums


def rle_row_bytes(nbytes: int) -> int:
    """v3 data-row width: [delta u8 | mask bytes], floored at 4 so the
    count header (u32 LE in row 0) always fits."""
    return max(1 + nbytes, 4)


def rle_payload(rows: jax.Array, nbytes: int, capacity: int):
    """Shared RLE compaction (protocol v3): mask rows u32 [P, W] ->
    (out u8 [capacity + 1, rle_row_bytes(nbytes)], count i32).

    Output row i < count is [delta u8 | mask bytes]: delta is the
    position gap to the PREVIOUS data row (row 0 sits at position 0 with
    delta 0), so host decode is a u8 cumsum — 2 fewer bytes per row than
    an absolute u24 position, and d2h volume is the steady-state wall on
    this rig.  Runs longer than 255 positions carry injected continuation
    rows (same mask, delta 255) so every gap fits u8; the worst case adds
    P/255 rows.  Popcounts and per-genome totals are host-derived from
    the mask bytes (unpack_rle2 / rle2_colsums), so the device ships only
    what cannot be recomputed.  Rows past `capacity` are dropped into the
    final trash row; `count` always reports the true (v3) row count so
    the caller can detect overflow."""
    P = rows.shape[0]
    by = masks_to_bytes(rows)[:, :nbytes]
    change0 = jnp.concatenate([
        jnp.ones(1, bool), jnp.any(rows[1:] != rows[:-1], axis=1)
    ])
    iota = jnp.arange(P, dtype=jnp.int32)
    # distance from the last REAL change; continuation rows at every
    # multiple of 255 keep all v3 gaps <= 255
    last0 = jax.lax.cummax(jnp.where(change0, iota, -1))
    dist = iota - last0
    change = change0 | ((dist > 0) & (dist % 255 == 0))
    pos = jnp.cumsum(change.astype(jnp.int32)) - 1
    count = pos[-1] + 1
    slots = jnp.where(change & (pos < capacity), pos, capacity)

    lastv3 = jax.lax.cummax(jnp.where(change, iota, -1))
    prev = jnp.concatenate([jnp.zeros(1, jnp.int32), lastv3[:-1]])
    delta = jnp.where(iota == 0, 0, iota - prev).astype(jnp.uint8)

    rowb = rle_row_bytes(nbytes)
    parts = [delta[:, None], by]
    if rowb > 1 + nbytes:
        parts.append(jnp.zeros((P, rowb - 1 - nbytes), jnp.uint8))
    payload = jnp.concatenate(parts, axis=1)
    out = jnp.zeros((capacity + 1, rowb), jnp.uint8).at[slots].set(
        payload, mode="drop")
    return out, count


@partial(jax.jit, static_argnums=(2, 3, 4, 5, 6, 7, 8))
def anchor_chunk_rle2(inbuf: jax.Array, table: jax.Array,
                      L: int, k: int, nbits: int, cap: int,
                      nwords: int, nbytes: int, capacity: int):
    """Transfer-optimal fast path: ONE u8 input buffer (packed bases ++
    N-mask, from pack_bases_combined) and ONE u8 output buffer per chunk.

    Returns combined u8 [capacity + 2, rle_row_bytes(nbytes)]:
      row 0        header — bytes 0:4 hold the true run count (u32 LE)
      rows 1..cnt  RLE v3 data rows [delta u8 | mask bytes]
    Folding the count into the buffer means the host learns count AND
    receives the typical-case payload in a SINGLE speculative prefix
    transfer (collect_rle2) — on high-latency links (this rig: 50-90 ms
    per d2h call) the per-chunk round trip for a separate stats array was
    a first-order cost.  Host side: collect_rle2 -> unpack_rle2 /
    rle2_colsums.  count > capacity signals overflow (rows were dropped);
    the caller falls back to anchor_chunk_fast.
    """
    from .codec import pack_kmers_packed

    n4 = (L + 3) // 4
    packed = jax.lax.slice(inbuf, (0,), (n4,))
    nmask = jax.lax.slice(inbuf, (n4,), (inbuf.shape[0],))
    canon, _ = pack_kmers_packed(packed, nmask, L, k)
    rows = _query(canon, table, nbits, cap, nwords)
    body, count = rle_payload(rows, nbytes, capacity)

    cnt32 = count.astype(jnp.uint32)
    cshift = np.array([0, 8, 16, 24], np.uint32)
    header = jnp.zeros((1, rle_row_bytes(nbytes)), jnp.uint8).at[0, :4].set(
        ((cnt32 >> cshift) & 0xFF).astype(jnp.uint8))
    return jnp.concatenate([header, body], axis=0)


def pack_bases_combined(codes: np.ndarray):
    """Host-side single-buffer companion of pack_bases_np: returns
    (inbuf u8 [ceil(L/4) + ceil(L/8)], L)."""
    from .codec import pack_bases_np

    packed, nmask, L = pack_bases_np(codes)
    return np.concatenate([packed, nmask]), L


try:  # native memcpy decoder (faster than np.repeat); optional build
    from ..native.anchor_cpu import rle_expand_native as _rle_expand_native
except OSError:  # pragma: no cover - library not built
    _rle_expand_native = None


def _rle_pos(rowsc: np.ndarray) -> np.ndarray:
    """v3 delta column -> absolute positions, int64 [count] (row 0 has
    delta 0 == position 0, so a plain cumsum reconstructs)."""
    return np.cumsum(rowsc[:, 0].astype(np.int64))


_POPC8 = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None],
                       axis=1).sum(axis=1).astype(np.int32)


def unpack_rle2(data_rows: np.ndarray, count: int, total: int,
                nbytes: int, out=None):
    """Host-side decode of RLE v3 data rows ([delta u8 | mask bytes],
    width rle_row_bytes(nbytes), header already stripped): returns
    (bytes [total, nbytes], popc i32 [total]).  popc is recomputed from
    the mask bytes — cheaper to rebuild per ROW here than to ship per
    run over the link.

    `out=(out_b, out_p)` reuses caller buffers (see rle_expand_native:
    fresh multi-MB allocations stall on page faults on this sandbox)."""
    if _rle_expand_native is not None and count > 0:
        return _rle_expand_native(data_rows, count, total, nbytes, out=out)
    rowsc = data_rows[:count]
    pos = _rle_pos(rowsc)
    by = rowsc[:, 1 : 1 + nbytes]
    popc = _POPC8[by].sum(axis=1, dtype=np.int32)
    reps = np.diff(pos, append=total)
    return np.repeat(by, reps, axis=0), np.repeat(popc, reps)


def rle2_colsums(data_rows: np.ndarray, count: int, total: int,
                 ngenomes: int) -> np.ndarray:
    """Exact per-genome presence totals from RLE rows x run lengths —
    host-side replacement for the device column-sum reductions (the
    paircount_sums of reference index.py:1051).  `total` must be the REAL
    position count (padding rows are zero anyway)."""
    nbytes = (ngenomes + 7) // 8
    rowsc = data_rows[:count]
    reps = np.diff(_rle_pos(rowsc), append=total).clip(min=0)
    bits = np.unpackbits(rowsc[:, 1 : 1 + nbytes], axis=1,
                         bitorder="little")[:, :ngenomes]
    return (bits.astype(np.int64) * reps[:, None]).sum(axis=0)


_PIECE = 1 << 16       # rows per transfer piece (one cached slice program)
# chunks dispatched ahead of the drain point: deeper pipelines hide more
# d2h behind compute when the link is slow, at ~rle-buffer host memory per
# in-flight chunk (env-tunable for link-bound deployments)
PIPELINE_DEPTH = int(os.environ.get("PANAGRAM_TPU_PIPELINE_DEPTH", "4"))
_piece_fns: dict = {}


def _piece_dev(combined: jax.Array, start: int):
    """Device dynamic-slice of one fixed-size piece, via ONE cached
    program per buffer shape (a static slice per observed count would
    recompile; remote compiles cost 30-500 s on this rig).  Returns
    (device array [piece, rowb], piece)."""
    import jax as _jax

    rows, rowb = combined.shape
    piece = min(_PIECE, rows)
    key = (rows, rowb, str(combined.dtype), piece)
    fn = _piece_fns.get(key)
    if fn is None:
        def _slice(arr, s):
            return jax.lax.dynamic_slice(arr, (s, jnp.int32(0)),
                                         (piece, rowb))
        fn = _jax.jit(_slice)
        _piece_fns[key] = fn
    return fn(combined, jnp.int32(start)), piece


def dispatch_rle_prefix(combined: jax.Array, hint: int | None = None):
    """Start the device->host copies for an anchor_chunk_rle2 result
    immediately after the kernel dispatch: fixed-size dynamic-slice pieces
    (exact-size to ~12% over the expected run count — pow2 prefix slices
    measured 62% over-transfer at observed counts, and the d2h link is the
    steady-state wall) are queued with copy_to_host_async, so they overlap
    later chunks' compute/host work (async pieces pipeline at full link
    rate; tools/measure_link.py).  Piece 0 carries the count header.
    hint=None (no observed count yet) covers the WHOLE buffer — an
    undersized read costs a synchronous piece round trip at drain time.
    Returns the piece list for collect_rle2."""
    total = combined.shape[0]
    if hint is None:
        # no observed count yet: read 1/8 of the buffer (run counts land
        # far below that on real pangenomes — a miss costs one synchronous
        # piece round trip, once per process)
        target = max(total // 8, min(total, _PIECE))
    else:
        target = min(hint + (hint >> 3) + 2, total)
    pieces = []
    s = 0
    while s < target:
        piece_len = min(_PIECE, total)
        sa = min(s, total - piece_len)
        arr, piece_len = _piece_dev(combined, sa)
        try:
            arr.copy_to_host_async()
        except Exception:  # pragma: no cover - backend without async copies
            pass
        pieces.append((sa, arr))
        s = sa + piece_len
    return pieces


def collect_rle2(pieces, combined: jax.Array, out: np.ndarray | None = None):
    """Host-side collection of an anchor_chunk_rle2 result from its
    dispatched piece list.

    Returns (data_rows u8 [count, 3 + nbytes] | None, count): None when
    count overflowed the device capacity (the caller re-runs the chunk
    through anchor_chunk_fast).  The speculative pieces usually satisfy
    the whole read; a larger count fetches the remainder synchronously
    through the same cached slice program.  `out` (u8 [>= count + 1,
    rowb]) reuses a caller buffer for the assembly — fresh multi-MB
    allocations stall on sandbox page faults (see rle_expand_native)."""
    total_rows, rowb = combined.shape
    first = np.asarray(pieces[0][1])
    count = int(first[0, :4].copy().view("<u4")[0])
    capacity = total_rows - 2
    if count > capacity:
        return None, count
    need = count + 1                      # rows including the header
    if need <= first.shape[0]:
        return first[1:need], count

    buf = out if out is not None else np.empty((need, rowb), np.uint8)
    assert buf.shape[0] >= need and buf.shape[1] == rowb
    covered = 0
    for sa, arr in pieces:
        if covered >= need:
            break
        a = np.asarray(arr)
        hi = min(sa + a.shape[0], need)
        if hi > covered:
            buf[covered:hi] = a[covered - sa: hi - sa]
            covered = hi
    while covered < need:                 # speculative read fell short
        piece_len = min(_PIECE, total_rows)
        sa = min(covered, total_rows - piece_len)
        arr, piece_len = _piece_dev(combined, sa)
        part = np.asarray(arr)
        hi = min(sa + piece_len, need)
        buf[covered:hi] = part[covered - sa: hi - sa]
        covered = hi
    return buf[1:need], count


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
