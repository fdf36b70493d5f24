"""Canonical k-mer codec (JAX/XLA).

TPU-native restatement of KMC's k-mer extraction (the role of `kmc` counting
input parsing + CKmerAPI canonicalization in the reference; see
/root/reference/cpp/anchor.cpp:148 GetCountersForRead and SURVEY §7.1):

* bases are 2-bit encoded (A=0,C=1,G=2,T=3); non-ACGT marks the window
  invalid (KMC returns counter 0 for such windows);
* a k-mer is packed into a u64 with the first base most significant;
* the canonical form is min(forward, reverse-complement).

Everything here is shape-static and jit-friendly: the packing is k shifted
elementwise accumulations that XLA fuses into a single memory-bound pass.
k <= 31 so the packed value fits 62 bits, leaving u64 max free as a
sentinel for padding/invalid slots.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

MAX_K = 31

# Sentinel key: compares greater than any valid (2k<=62-bit) kmer.
SENTINEL = jnp.uint64(0xFFFFFFFFFFFFFFFF)


def _check_k(k: int):
    if not (1 <= k <= MAX_K):
        raise ValueError(f"k must be in [1, {MAX_K}], got {k}")


@partial(jax.jit, static_argnums=(1,))
def pack_kmers(codes: jax.Array, k: int):
    """codes: uint8 [L] (values 0-3 valid, >=4 invalid).

    Returns (canon: u64 [L-k+1], valid: bool [L-k+1]).  Invalid windows get
    canon == SENTINEL so they never match a dictionary key.
    """
    n = codes.shape[0] - k + 1
    c64 = codes.astype(jnp.uint64)
    fwd = jnp.zeros(n, jnp.uint64)
    rc = jnp.zeros(n, jnp.uint64)
    valid = jnp.ones(n, bool)
    three = jnp.uint64(3)
    for i in range(k):
        ci = jax.lax.slice(c64, (i,), (i + n,))
        fwd = fwd | ((ci & three) << np.uint64(2 * (k - 1 - i)))
        rc = rc | (((three - ci) & three) << np.uint64(2 * i))
        valid = valid & (jax.lax.slice(codes, (i,), (i + n,)) < 4)
    canon = jnp.minimum(fwd, rc)
    canon = jnp.where(valid, canon, SENTINEL)
    return canon, valid


def canonical_kmers(codes, k: int):
    """Host-friendly wrapper: accepts numpy uint8 codes, returns numpy
    (canon, valid) with invalid canon zeroed (oracle convention)."""
    _check_k(k)
    codes = jnp.asarray(codes, jnp.uint8)
    if codes.shape[0] < k:
        return np.zeros(0, np.uint64), np.zeros(0, bool)
    canon, valid = pack_kmers(codes, k)
    canon = np.asarray(canon)
    valid = np.asarray(valid)
    canon = np.where(valid, canon, np.uint64(0))
    return canon, valid
