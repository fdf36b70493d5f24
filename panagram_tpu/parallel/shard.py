"""Sharded dictionary + distributed anchoring step (shard_map + collectives).

This is the distributed-systems core the reference lacks entirely (SURVEY
§5.8: "no NCCL/MPI/Gloo ... this is new, idiomatic-JAX design space"):

* the pan-kmer dictionary is **range-sharded** over the mesh axis: device d
  owns sorted keys in [boundary[d], boundary[d+1]); boundaries are key
  quantiles so shards stay balanced;
* anchor positions are **sequence-sharded**: each device packs canonical
  k-mers for its contiguous slice of the chromosome (with (k-1)-base halo,
  the pattern of reference cpp/anchor.cpp:127);
* each device routes its queries to the owning dict shard with
  ``all_to_all`` (sort-by-destination + capacity-C dispatch), looks up
  locally (binary search), and routes mask rows back with a second
  ``all_to_all``;
* per-genome totals and occupancy histograms are reduced with ``psum`` —
  deterministic reduction order, preserving bit-identical outputs.

Everything compiles under jit over a ``jax.sharding.Mesh`` and runs
unmodified on a virtual 8-device CPU mesh (tests) or a TPU slice.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops.codec import SENTINEL, pack_kmers
from ..ops.dictionary import PanKmerDict
from ..ops.lookup import mix64
from .mesh import DICT_AXIS


@dataclasses.dataclass
class ShardedDict:
    """Range-sharded dictionary resident across devices.

    keys/masks are [n_shards, cap] / [n_shards, cap, W] arrays sharded on
    axis 0 over the mesh; padding rows hold SENTINEL keys.  boundaries is a
    replicated [n_shards] array of shard lower bounds (boundary[0] == 0).
    """

    keys: jax.Array       # u64 [S, cap] sharded
    masks: jax.Array      # u32 [S, cap, W] sharded
    boundaries: jax.Array  # u64 [S] replicated
    ngenomes: int
    k: int
    mixed: bool = False   # keys/boundaries live in splitmix64-mixed space

    @property
    def nwords(self):
        return self.masks.shape[-1]


def shard_dictionary(pan_dict: PanKmerDict, mesh) -> ShardedDict:
    """Split a host PanKmerDict into balanced range shards and place them."""
    n = mesh.devices.size
    D = len(pan_dict.keys)
    W = pan_dict.masks.shape[1] if pan_dict.masks.ndim == 2 else 1

    # quantile boundaries over the sorted key array
    cuts = [(i * D) // n for i in range(n + 1)]
    cap = max((cuts[i + 1] - cuts[i]) for i in range(n)) if D else 1
    keys = np.full((n, cap), np.uint64(SENTINEL), np.uint64)
    masks = np.zeros((n, cap, W), np.uint32)
    bounds = np.zeros(n, np.uint64)
    for i in range(n):
        lo, hi = cuts[i], cuts[i + 1]
        keys[i, : hi - lo] = pan_dict.keys[lo:hi]
        masks[i, : hi - lo] = pan_dict.masks[lo:hi]
        bounds[i] = pan_dict.keys[lo] if hi > lo and i > 0 else 0
    # ensure monotone bounds even with empty shards
    for i in range(1, n):
        if bounds[i] < bounds[i - 1]:
            bounds[i] = bounds[i - 1]

    shard = NamedSharding(mesh, P(DICT_AXIS))
    repl = NamedSharding(mesh, P())
    return ShardedDict(
        keys=jax.device_put(keys, shard),
        masks=jax.device_put(masks, shard),
        boundaries=jax.device_put(bounds, repl),
        ngenomes=pan_dict.ngenomes,
        k=pan_dict.k,
    )


def _uniform_bounds(n_shards: int) -> np.ndarray:
    """Mixed-key space is uniform, so shard boundaries are just equal
    slices of the u64 range."""
    return (np.arange(n_shards, dtype=np.uint64)
            * np.uint64((1 << 64) // n_shards))


def _dispatch(values, tgt, n_shards, *payloads):
    """Sort-by-destination capacity-C dispatch: returns ([S, C] buffers for
    values and each payload, plus (order, tgt_s, slot) to un-dispatch)."""
    C = values.shape[0]
    order = jnp.argsort(tgt, stable=True)
    tgt_s = tgt[order]
    counts = jnp.bincount(tgt_s, length=n_shards)
    offsets = jnp.cumsum(counts) - counts
    slot = jnp.arange(C) - offsets[tgt_s]
    bufs = []
    buf = jnp.full((n_shards, C), SENTINEL, jnp.uint64).at[
        tgt_s, slot].set(values[order])
    bufs.append(buf)
    for p in payloads:
        pb = jnp.zeros((n_shards, C), p.dtype).at[tgt_s, slot].set(p[order])
        bufs.append(pb)
    return bufs, (order, tgt_s, slot)


def _all_to_all(x, n_shards):
    out = jax.lax.all_to_all(x, DICT_AXIS, split_axis=0, concat_axis=0,
                             tiled=False)
    return out.reshape(n_shards, -1)


def _build_shard_body(keys, gids, nwords: int, n_shards: int, cap: int):
    """shard_map body for the distributed dictionary build: route (key,
    genome) pairs to their owning shard by mixed-key range (hash-bucket
    all_to_all, SURVEY §5.8 P8a), then sort-merge locally into
    (keys [cap], masks [cap, W], count)."""
    keys = keys.reshape(-1)
    gids = gids.reshape(-1)
    C = keys.shape[0]

    m = jnp.where(keys == SENTINEL, SENTINEL, mix64(keys))
    bounds = jnp.asarray(_uniform_bounds(n_shards))
    tgt = jnp.clip(jnp.searchsorted(bounds, m, side="right") - 1,
                   0, n_shards - 1).astype(jnp.int32)

    (kbuf, gbuf), _ = _dispatch(m, tgt, n_shards, gids)
    krecv = _all_to_all(kbuf, n_shards).reshape(-1)   # [S*C]
    grecv = _all_to_all(gbuf, n_shards).reshape(-1)

    # local merge (the logic of ops.dictionary._merge_sets)
    ks, g = jax.lax.sort((krecv, grecv), num_keys=1)
    real = ks != SENTINEL
    is_start = jnp.concatenate(
        [jnp.ones(1, bool), ks[1:] != ks[:-1]]) & real
    seg = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    count = seg[-1] + 1
    T = ks.shape[0]

    safe = jnp.where(real, ks, jnp.uint64(0))
    out_keys = jax.ops.segment_max(safe, seg, num_segments=T)
    out_keys = jnp.where(jnp.arange(T) < count, out_keys, SENTINEL)

    word = g // 32
    bit = (jnp.uint32(1) << (g % 32).astype(jnp.uint32))
    cols = []
    for w in range(nwords):
        contrib = jnp.where(real & (word == w), bit, jnp.uint32(0))
        cols.append(jax.ops.segment_sum(contrib, seg, num_segments=T))
    masks = jnp.stack(cols, axis=1)
    masks = jnp.where((jnp.arange(T) < count)[:, None], masks,
                      jnp.uint32(0))

    return out_keys[:cap], masks[:cap], count[None]


def sharded_build_dictionary(genome_sets, mesh, ngenomes: int, k: int,
                             cap_factor: float = 2.5) -> "ShardedDict":
    """Distributed dictionary build over the mesh.

    genome_sets[g]: host numpy u64 distinct canonical keys of genome g.
    Pairs are scattered round-robin across devices, routed to their owning
    shard with all_to_all by mixed-key range, and merged locally — the
    collective design SURVEY §2.7 P8 calls for.  Returns a ShardedDict in
    mixed-key space (uniform range boundaries) directly usable by
    sharded_anchor_step(mixed=True).
    """
    n = mesh.devices.size
    W = (ngenomes + 31) // 32
    total = int(sum(len(s) for s in genome_sets))
    per_dev = -(-max(total, 1) // n)
    keys = np.full(n * per_dev, np.uint64(SENTINEL), np.uint64)
    gids = np.zeros(n * per_dev, np.int32)
    off = 0
    for g, s in enumerate(genome_sets):
        keys[off : off + len(s)] = s
        gids[off : off + len(s)] = g
        off += len(s)

    # a shard receives at most n*per_dev entries (everything); cap_factor
    # covers hash imbalance without allocating the full worst case
    cap = min(int(per_dev * cap_factor), n * per_dev)
    shard = NamedSharding(mesh, P(DICT_AXIS))
    kd = jax.device_put(keys.reshape(n, per_dev), shard)
    gd = jax.device_put(gids.reshape(n, per_dev), shard)

    body = partial(_build_shard_body, nwords=W, n_shards=n, cap=cap)
    f = shard_map(
        body, mesh=mesh,
        in_specs=(P(DICT_AXIS), P(DICT_AXIS)),
        out_specs=(P(DICT_AXIS), P(DICT_AXIS), P(DICT_AXIS)),
    )
    out_keys, out_masks, counts = jax.jit(f)(kd, gd)
    counts = np.asarray(counts)
    if np.any(counts > cap):
        raise RuntimeError("sharded build: shard overflowed cap; "
                           "increase cap_factor")

    bounds = jax.device_put(_uniform_bounds(n), NamedSharding(mesh, P()))
    return ShardedDict(
        keys=out_keys.reshape(n, cap),
        masks=out_masks.reshape(n, cap, W),
        boundaries=bounds,
        ngenomes=ngenomes,
        k=k,
        mixed=True,
    )


def _route_lookup(canon, keys_l, masks_l, boundaries, n_shards):
    """Per-device body: dispatch canon queries to owning shards, look up,
    return mask rows aligned with canon.  canon u64 [C]."""
    C = canon.shape[0]
    W = masks_l.shape[-1]

    # destination shard of each query (SENTINEL -> last shard, harmless miss)
    tgt = jnp.clip(
        jnp.searchsorted(boundaries, canon, side="right") - 1, 0, n_shards - 1
    ).astype(jnp.int32)

    # stable sort by destination; contiguous runs per destination
    order = jnp.argsort(tgt, stable=True)
    tgt_s = tgt[order]
    canon_s = canon[order]
    counts = jnp.bincount(tgt_s, length=n_shards)
    offsets = jnp.cumsum(counts) - counts
    slot = jnp.arange(C) - offsets[tgt_s]

    # capacity-C dispatch buffer [S, C]
    buf = jnp.full((n_shards, C), SENTINEL, jnp.uint64).at[tgt_s, slot].set(canon_s)

    # route queries to owners
    recv = jax.lax.all_to_all(buf, DICT_AXIS, split_axis=0, concat_axis=0,
                              tiled=False)
    recv = recv.reshape(n_shards, C)

    # local lookup (keys_l sorted, SENTINEL-padded)
    q = recv.reshape(-1)
    cap = keys_l.shape[0]
    idx = jnp.clip(jnp.searchsorted(keys_l, q), 0, cap - 1)
    hit = (keys_l[idx] == q) & (q != SENTINEL)
    rows = jnp.where(hit[:, None], masks_l[idx], jnp.uint32(0))
    rows = rows.reshape(n_shards, C, W)

    # route results back to requesters
    back = jax.lax.all_to_all(rows, DICT_AXIS, split_axis=0, concat_axis=0,
                              tiled=False)
    back = back.reshape(n_shards, C, W)

    # un-dispatch: my query i (sorted order) lives at [tgt_s[i], slot[i]]
    rows_sorted = back[tgt_s, slot]
    inv = jnp.zeros(C, jnp.int32).at[order].set(jnp.arange(C, dtype=jnp.int32))
    return rows_sorted[inv]


def _anchor_step_body(codes, keys_l, masks_l, boundaries, k, n_shards,
                      ngenomes, binlen, nbins_local, mixed=False,
                      total_positions=None):
    """shard_map body: codes u8 [C + k - 1] (this device's halo'd slice).

    Returns (rows u32 [C, W], popc i32 [C], colsums i64 [N] psum'd,
    hist i64 [nbins_local, N+1] for this device's local bins)."""
    codes = codes.reshape(-1)
    keys_l = keys_l.reshape(-1)                      # local [1, cap] -> [cap]
    masks_l = masks_l.reshape(masks_l.shape[-2], masks_l.shape[-1])
    canon, _ = pack_kmers(codes, k)
    if mixed:
        canon = jnp.where(canon == SENTINEL, SENTINEL, mix64(canon))
    rows = _route_lookup(canon, keys_l, masks_l, boundaries, n_shards)
    popc = jnp.sum(jax.lax.population_count(rows).astype(jnp.int32), axis=-1)

    # per-genome totals, reduced across all devices (deterministic psum)
    sums = []
    for g in range(ngenomes):
        w, bit = divmod(g, 32)
        sums.append(jnp.sum(((rows[:, w] >> np.uint32(bit)) & 1).astype(jnp.int64)))
    colsums = jax.lax.psum(jnp.stack(sums), DICT_AXIS)

    # local occupancy histogram over this device's contiguous bins; halo
    # padding positions (beyond the real sequence) are routed to a trash
    # slot so they don't inflate the occupancy-0 count of the last bin
    C = popc.shape[0]
    bins = (jnp.arange(C) // binlen).astype(jnp.int32)
    flat = bins * (ngenomes + 1) + popc
    if total_positions is not None:
        my_start = jax.lax.axis_index(DICT_AXIS).astype(jnp.int64) * C
        real = my_start + jnp.arange(C) < total_positions
        flat = jnp.where(real, flat, nbins_local * (ngenomes + 1))
    hist = jnp.zeros(nbins_local * (ngenomes + 1) + 1,
                     jnp.int64).at[flat].add(1, mode="drop")
    hist = hist[:-1].reshape(nbins_local, ngenomes + 1)

    return rows, popc, colsums, hist


def sharded_anchor_step(mesh, sd: ShardedDict, codes_sharded: jax.Array,
                        binlen: int, total_positions: int | None = None):
    """Jit-compiled distributed anchor step.

    codes_sharded: u8 [n_shards, C + k - 1] — per-device halo'd sequence
    slices (device d's slice covers positions [d*C, (d+1)*C)).
    binlen must divide C (pad the sequence so it does).

    Returns (rows [n*C, W] u32, popc [n*C] i32, colsums [N] i64,
    hist [n*nbins_local, N+1] i64) as global (addressable) arrays.
    """
    n = mesh.devices.size
    C = codes_sharded.shape[1] - (sd.k - 1)
    if C % binlen != 0:
        raise ValueError(f"binlen {binlen} must divide per-device chunk {C}")
    nbins_local = C // binlen

    body = partial(
        _anchor_step_body,
        k=sd.k,
        n_shards=n,
        ngenomes=sd.ngenomes,
        binlen=binlen,
        nbins_local=nbins_local,
        mixed=sd.mixed,
        total_positions=total_positions,
    )

    f = shard_map(
        body,
        mesh=mesh,
        in_specs=(P(DICT_AXIS), P(DICT_AXIS), P(DICT_AXIS), P()),
        out_specs=(P(DICT_AXIS), P(DICT_AXIS), P(), P(DICT_AXIS)),
    )
    rows, popc, colsums, hist = jax.jit(f)(
        codes_sharded, sd.keys, sd.masks, sd.boundaries
    )
    return rows, popc, colsums, hist


def make_halo_chunks(codes: np.ndarray, n_shards: int, k: int,
                     chunk_per_dev: int | None = None):
    """Host-side: split a chromosome's codes into per-device halo'd slices.

    Returns (codes_sharded u8 [n, C + k - 1], total_positions).  Padding
    positions (beyond the real sequence) use code 255 -> SENTINEL -> zero
    masks, and must be stripped by the caller.
    """
    nk = len(codes) - k + 1
    if chunk_per_dev is None:
        chunk_per_dev = -(-nk // n_shards)
    C = chunk_per_dev
    out = np.full((n_shards, C + k - 1), 255, np.uint8)
    for d in range(n_shards):
        lo = d * C
        if lo >= nk:
            break
        m = min(C, nk - lo)
        out[d, : m + k - 1] = codes[lo : lo + m + k - 1]
    return out, nk
