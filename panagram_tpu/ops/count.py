"""Per-genome distinct canonical k-mer sets (sort-based counting).

TPU-native replacement for KMC's counting stage (reference
workflow/Snakefile rule kmc_count; SURVEY §7.2 L-count): the multiset of
canonical k-mers is reduced to a sorted distinct set by an on-device sort +
neighbor-compare dedup.  Shapes stay static by padding with SENTINEL keys,
which sort to the tail and are dropped on the host.

Counting a genome streams fixed-size chunks (one XLA compilation) through
pack+sort+dedup; the per-chunk sorted distinct sets are merged host-side.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .codec import SENTINEL, pack_kmers, _check_k


@jax.jit
def _sort_dedup(canon: jax.Array) -> jax.Array:
    """Sort keys and replace duplicates with SENTINEL, then re-sort so the
    distinct keys are packed at the front (static-shape unique)."""
    s = jnp.sort(canon)
    dup = jnp.concatenate([jnp.zeros(1, bool), s[1:] == s[:-1]])
    s = jnp.where(dup, SENTINEL, s)
    return jnp.sort(s)


@partial(jax.jit, static_argnums=(1,))
def _chunk_distinct(codes: jax.Array, k: int) -> jax.Array:
    canon, _ = pack_kmers(codes, k)
    return _sort_dedup(canon)


def distinct_kmers(codes, k: int) -> np.ndarray:
    """Sorted distinct canonical k-mers of one sequence (device compute,
    host-materialized, sentinel-stripped)."""
    _check_k(k)
    codes = jnp.asarray(codes, jnp.uint8)
    if codes.shape[0] < k:
        return np.zeros(0, np.uint64)
    out = np.asarray(_chunk_distinct(codes, k))
    n = np.searchsorted(out, np.uint64(SENTINEL))
    return out[:n]


DEFAULT_CHUNK = 1 << 22  # 4M positions per device chunk


def distinct_kmers_chunked(code_arrays, k: int, chunk: int = DEFAULT_CHUNK) -> np.ndarray:
    """Distinct canonical k-mers over many sequences (a genome).

    Streams (k-1)-halo'd fixed-size chunks through the device (the
    sequence-chunking pattern of reference cpp/anchor.cpp:112-147, SURVEY
    §5.7), then merges per-chunk sorted sets host-side.
    """
    _check_k(k)
    parts: list[np.ndarray] = []
    buf = np.full(chunk + k - 1, 255, np.uint8)
    for codes in code_arrays:
        codes = np.asarray(codes, np.uint8)
        n = len(codes) - k + 1
        if n <= 0:
            continue
        for start in range(0, n, chunk):
            m = min(chunk, n - start)
            buf[:] = 255  # pad: invalid base -> SENTINEL kmers
            buf[: m + k - 1] = codes[start : start + m + k - 1]
            out = np.asarray(_chunk_distinct(jnp.asarray(buf), k))
            nn = np.searchsorted(out, np.uint64(SENTINEL))
            parts.append(out[:nn])
    if not parts:
        return np.zeros(0, np.uint64)
    if len(parts) == 1:
        return parts[0]
    return np.unique(np.concatenate(parts))
