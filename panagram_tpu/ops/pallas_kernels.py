"""Pallas TPU kernels for the anchoring hot loop.

The XLA path (ops/anchor.py) emits separate fused loops for popcount,
per-genome column sums, and byte-packing — each re-reading the mask rows
from HBM.  These kernels fuse all three reductions into ONE pass over the
rows (one HBM read), the pattern cpp/anchor.cpp:155-189 uses on CPU
(byte-pack + __builtin_popcount + histogram in a single loop).

Kernels are grid-tiled over positions with VMEM-resident blocks and run on
TPU or under `interpret=True` on CPU (how the unit tests exercise them).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 2048  # positions per grid step (rows tile: [TILE, W] u32 in VMEM)


def pallas_enabled() -> bool:
    return os.environ.get("PANAGRAM_TPU_PALLAS", "0") == "1"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _popcount_u32(x):
    """Bit-twiddling popcount (VPU-friendly, no LUT)."""
    x = x - ((x >> 1) & jnp.uint32(0x55555555))
    x = (x & jnp.uint32(0x33333333)) + ((x >> 2) & jnp.uint32(0x33333333))
    x = (x + (x >> 4)) & jnp.uint32(0x0F0F0F0F)
    return (x * jnp.uint32(0x01010101)) >> 24


def _fused_kernel(rows_ref, popc_ref, colsum_ref, nwords: int, ngenomes: int):
    """One tile: read rows once; both reductions (per-position popcount,
    per-genome totals) are expressed as int8 x int8 -> int32 matmuls so
    they run on the MXU (Mosaic has no generic reduce lowering, and under
    jax x64 jnp.sum would route through unsupported 64-bit accumulators)."""
    rows = rows_ref[:]                                   # [TILE, W] u32
    tile = rows.shape[0]

    # unpack presence bits -> [TILE, N] int8
    cols = []
    for g in range(ngenomes):
        w, bit = divmod(g, 32)
        cols.append(((rows[:, w] >> np.uint32(bit)) & 1).astype(jnp.int8))
    bits = jnp.stack(cols, axis=1)

    ones_n = jnp.ones((ngenomes, 1), jnp.int8)
    popc_ref[:] = jax.lax.dot_general(
        bits, ones_n, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )[:, 0]

    step = pl.program_id(0)

    @pl.when(step == 0)
    def _():
        colsum_ref[:] = jnp.zeros_like(colsum_ref)

    ones_t = jnp.ones((1, tile), jnp.int8)
    tile_sums = jax.lax.dot_general(
        ones_t, bits, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )[0]
    colsum_ref[:] = colsum_ref[:] + tile_sums


def fused_popcount_colsums(rows: jax.Array, ngenomes: int):
    """rows u32 [P, W] (P % TILE == 0; only bits < ngenomes set) ->
    (popc i32 [P], colsums i32 [N]).

    Single-pass Pallas replacement for mask_popcount + genome_column_sums.
    Traced with x64 disabled (jax.enable_x64(False)): the engine's global x64 mode leaks 64-bit
    index scalars into the kernel, which Mosaic cannot lower.
    """
    P, W = rows.shape
    grid = P // TILE
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_fused_kernel, nwords=W, ngenomes=ngenomes),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((TILE,), lambda i: (i,),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((ngenomes,), lambda i: (0,),
                             memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((P,), jnp.int32),
                jax.ShapeDtypeStruct((ngenomes,), jnp.int32),
            ),
            interpret=_interpret(),
        )(rows)


def _bytes_kernel(rows_ref, out_ref, nwords: int, nbytes: int):
    """u32 mask words -> little-endian bytes, truncated to nbytes."""
    rows = rows_ref[:]
    cols = []
    for b in range(nbytes):
        w, sh = divmod(b, 4)
        cols.append(((rows[:, w] >> np.uint32(8 * sh)) & jnp.uint32(0xFF))
                    .astype(jnp.uint8))
    out_ref[:] = jnp.stack(cols, axis=1)


def masks_to_bytes_pallas(rows: jax.Array, nbytes: int):
    """rows u32 [P, W] -> bytes u8 [P, nbytes]; Pallas twin of
    ops.anchor.masks_to_bytes with the device-side truncation fused in."""
    P, W = rows.shape
    grid = P // TILE
    with jax.enable_x64(False):
        return pl.pallas_call(
            partial(_bytes_kernel, nwords=W, nbytes=nbytes),
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((TILE, W), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE, nbytes), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((P, nbytes), jnp.uint8),
            interpret=_interpret(),
        )(rows)
