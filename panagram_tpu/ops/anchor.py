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
    """Popcount across mask words -> occupancy per position (int32 [P])."""
    return jnp.sum(jax.lax.population_count(rows).astype(jnp.int32), axis=-1)


@jax.jit
def masks_to_bytes(rows: jax.Array) -> jax.Array:
    """u32 [P, W] -> little-endian uint8 [P, 4W].  The caller truncates to
    nbytes = ceil(N/8) columns, reproducing the reference's per-DB byte
    slice layout (panagram/index.py:937-947, cpp/anchor.cpp:138-165)."""
    P, W = rows.shape
    shifts = np.array([0, 8, 16, 24], np.uint32)
    b = (rows[:, :, None] >> shifts[None, None, :]) & jnp.uint32(0xFF)
    return b.astype(jnp.uint8).reshape(P, 4 * W)


@partial(jax.jit, static_argnums=(1,))
def genome_column_sums(rows: jax.Array, ngenomes: int) -> jax.Array:
    """Per-genome presence totals over positions (int64 [N]) — the
    paircount_sums of reference index.py:1051."""
    sums = []
    for g in range(ngenomes):
        w, bit = divmod(g, 32)
        sums.append(jnp.sum(((rows[:, w] >> np.uint32(bit)) & 1).astype(jnp.int64)))
    return jnp.stack(sums)


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
