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
