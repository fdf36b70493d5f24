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

    Implemented as a fori_loop over base PAIRS accumulating into native u32
    (hi, lo) halves: half the iterations of the per-base loop and no
    emulated 64-bit shifts inside it (TPU emulates u64 with 32-bit pairs).
    The rolled loop keeps the HLO small for remote-compile backends.
    """
    n = codes.shape[0] - k + 1
    c32 = codes.astype(jnp.uint32)
    three = jnp.uint32(3)

    def put(hi, lo, val, s):
        """(hi, lo) |= val << s for a 4-bit val and even traced shift s in
        [0, 2k-4]; shift amounts are clamped so XLA's shift semantics never
        see >= 32."""
        lo = lo | jnp.where(s < 32, val << jnp.minimum(s, 31), jnp.uint32(0))
        hi = hi | jnp.where(
            s >= 32,
            val << jnp.minimum(jnp.maximum(s, 32) - 32, 31),
            val >> jnp.minimum(32 - jnp.minimum(s, 31), 31),
        )
        return hi, lo

    def body(j, state):
        fhi, flo, rhi, rlo, valid = state
        i = 2 * j
        c0 = jax.lax.dynamic_slice(c32, (i,), (n,))
        c1 = jax.lax.dynamic_slice(c32, (i + 1,), (n,))
        fpair = ((c0 & three) << 2) | (c1 & three)
        rpair = (((three - c1) & three) << 2) | ((three - c0) & three)
        sf = jnp.uint32(2 * (k - 2)) - 4 * j.astype(jnp.uint32)
        sr = 4 * j.astype(jnp.uint32)
        fhi, flo = put(fhi, flo, fpair, sf)
        rhi, rlo = put(rhi, rlo, rpair, sr)
        valid = valid & (c0 < 4) & (c1 < 4)
        return fhi, flo, rhi, rlo, valid

    # derive the carry inits from the input so their varying-axis type
    # matches the body output under shard_map (zeros literals would be
    # "unvarying" and fail the scan carry check)
    z = jax.lax.slice(c32, (0,), (n,)) & jnp.uint32(0)
    valid0 = z == 0
    fhi, flo, rhi, rlo, valid = jax.lax.fori_loop(
        0, k // 2, body, (z, z, z, z, valid0))

    if k % 2 == 1:
        # odd k: one single-base tail at i = k-1 (static shifts)
        ci = jax.lax.slice(c32, (k - 1,), (k - 1 + n,))
        flo = flo | (ci & three)  # forward shift 0
        s = 2 * (k - 1)
        rv = (three - ci) & three
        if s < 32:
            rlo = rlo | (rv << np.uint32(s))
            if s > 28:
                rhi = rhi | (rv >> np.uint32(32 - s))
        else:
            rhi = rhi | (rv << np.uint32(s - 32))
        valid = valid & (ci < 4)

    take_f = (fhi < rhi) | ((fhi == rhi) & (flo <= rlo))
    chi = jnp.where(take_f, fhi, rhi).astype(jnp.uint64)
    clo = jnp.where(take_f, flo, rlo).astype(jnp.uint64)
    canon = (chi << np.uint64(32)) | clo
    canon = jnp.where(valid, canon, SENTINEL)
    return canon, valid


def pack_bases_np(codes: np.ndarray):
    """Host-side 2-bit packing for cheap host->device transfer: returns
    (packed u8 [ceil(L/4)] with 4 bases/byte little-endian, nmask u8
    [ceil(L/8)] with bit i set when base i is non-ACGT, L).

    The reference streams raw ASCII into KMC (1 B/base); through a narrow
    host<->device link 2-bit packing is a 4x win (SURVEY §7.4.5 host IO)."""
    codes = np.asarray(codes, np.uint8)
    L = len(codes)
    invalid = codes >= 4
    c = np.where(invalid, 0, codes).astype(np.uint8)
    pad = (-L) % 4
    c4 = np.concatenate([c, np.zeros(pad, np.uint8)]).reshape(-1, 4)
    packed = (c4[:, 0] | (c4[:, 1] << 2) | (c4[:, 2] << 4) | (c4[:, 3] << 6))
    nmask = np.packbits(
        np.concatenate([invalid, np.zeros((-L) % 8, bool)]), bitorder="little"
    )
    return packed.astype(np.uint8), nmask, L


@partial(jax.jit, static_argnums=(2,))
def unpack_bases(packed: jax.Array, nmask: jax.Array, L: int) -> jax.Array:
    """Device-side unpack of pack_bases_np output -> u8 codes [L]
    (0-3 valid, 255 invalid)."""
    idx4 = jnp.arange(L) >> 2
    sh = (jnp.arange(L) & 3).astype(jnp.uint8) * 2
    codes = (jnp.take(packed, idx4) >> sh) & 3
    idx8 = jnp.arange(L) >> 3
    bit = (jnp.arange(L) & 7).astype(jnp.uint8)
    bad = (jnp.take(nmask, idx8) >> bit) & 1
    return jnp.where(bad == 1, jnp.uint8(255), codes.astype(jnp.uint8))


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
