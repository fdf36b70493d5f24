"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import numpy as np

from panagram_tpu.ops.pallas_kernels import (
    TILE,
    fused_popcount_colsums,
    masks_to_bytes_pallas,
)
from panagram_tpu.ops.ref_impl import masks_to_bytes_np, popcount_np


def test_fused_popcount_colsums(rng):
    P, W, N = 2 * TILE, 2, 40
    rows = rng.integers(0, 1 << 31, (P, W)).astype(np.uint32)
    # kernel contract: only bits < ngenomes are set (true of real mask rows)
    rows[:, 1] &= np.uint32((1 << (N - 32)) - 1)
    import jax.numpy as jnp

    popc, colsums = fused_popcount_colsums(jnp.asarray(rows), N)
    assert np.array_equal(np.asarray(popc), popcount_np(rows))
    bits = np.unpackbits(rows.astype("<u4").view(np.uint8), axis=1,
                         bitorder="little")[:, :N]
    assert np.array_equal(np.asarray(colsums), bits.sum(axis=0))


def test_masks_to_bytes_pallas(rng):
    P, W = TILE, 2
    rows = rng.integers(0, 1 << 31, (P, W)).astype(np.uint32)
    import jax.numpy as jnp

    for nbytes in (1, 4, 5):
        got = np.asarray(masks_to_bytes_pallas(jnp.asarray(rows), nbytes))
        assert np.array_equal(got, masks_to_bytes_np(rows, nbytes))


def test_pack_mix_pallas_matches_xla(rng):
    """Fused pack+mix kernel (interpret mode) == mix64(pack_kmers_packed):
    identical mixed pairs at the phase-major positions, SENTINEL windows
    (Ns) mapped to mix64(SENTINEL), padding positions all-ones."""
    import jax.numpy as jnp

    from panagram_tpu.ops import pallas_kernels as pk
    from panagram_tpu.ops.codec import pack_bases_np, pack_kmers_packed
    from panagram_tpu.ops.lookup import mix64_np

    for k in (5, 16, 21, 31):
        for L in (3 * 16 * 1024, 16 * 1024 * 4 + 7):
            codes = rng.integers(0, 4, L).astype(np.uint8)
            bad = rng.choice(L, L // 50, replace=False)
            codes[bad] = 255
            packed, nmask, L2 = pack_bases_np(codes)
            P = L - k + 1
            Ppad = -(-P // (16 * 1024)) * (16 * 1024)

            mhi, mlo = pk.pack_mix_pallas(jnp.asarray(packed),
                                          jnp.asarray(nmask), L2, k, Ppad)
            got_hi = np.asarray(mhi)
            got_lo = np.asarray(mlo)
            pos = np.asarray(pk.pack_mix_positions(Ppad)).reshape(16, -1)

            canon, _ = pack_kmers_packed(jnp.asarray(packed),
                                         jnp.asarray(nmask), L2, k)
            want = mix64_np(np.asarray(canon))
            J = Ppad // 16
            for r in (0, 1, 7, 15):
                p_r = pos[r]
                real = p_r < P
                w = want[p_r[real]]
                assert np.array_equal(got_hi[r][real],
                                      (w >> np.uint64(32)).astype(np.uint32)), (k, L, r)
                assert np.array_equal(got_lo[r][real],
                                      (w & np.uint64(0xFFFFFFFF)).astype(np.uint32)), (k, L, r)
                assert (got_hi[r][~real] == 0xFFFFFFFF).all()
                assert (got_lo[r][~real] == 0xFFFFFFFF).all()
