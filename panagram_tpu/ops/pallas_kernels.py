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

# merge-probe geometry: queries per grid step / table buckets per slice.
# TILE_Q=1024 measured best on v5e (the row-select matmul cost per query
# scales with tile_q x Bp/Qp; 1024 is Mosaic's minimum 1D block tile) —
# tools/sweep_span.py, ROUND2_NOTES.md
TILE_Q = 1024
SPAN = 2048


def pallas_enabled() -> bool:
    """Merge-probe lookup gate.  Default ON for the TPU backend (measured
    32.9 vs 30.9 M kmers/s end-to-end over the gather probe, consistent
    across reps — ROUND2_NOTES.md); interpret mode is far slower than the
    gather on CPU, so other backends default OFF.  PANAGRAM_TPU_PALLAS=1/0
    forces either way."""
    env = os.environ.get("PANAGRAM_TPU_PALLAS")
    if env is not None:
        return env == "1"
    return jax.default_backend() == "tpu"


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


def _probe_kernel(blo_ref, qhi_ref, qlo_ref, table_ref, out_ref,
                  scratch, sems, *, nbits: int, cap: int, sub: int,
                  pack: int, nwords: int, span: int, onehot: bool,
                  ablate: int = 0):
    """Merge probe over one query tile (queries pre-sorted by mixed key).

    The table slice [span, pack*sub] covering this tile's bucket range is
    DMA'd HBM->VMEM as ONE contiguous block (double-buffered across grid
    steps) — replacing the per-query random gather that runs at ~1% of
    HBM roofline with sequential reads at full bandwidth.  Each DMA row
    packs `pack` adjacent buckets of `sub` u32s (Mosaic requires VMEM
    slices 128-lane aligned; sub may be 64).  Matching scans ALL packed
    buckets in the query's row: a full (hi, lo) match outside the query's
    own bucket is impossible — equal hi implies equal top bits implies
    the same bucket — so no half-selection is needed.  Slot matching is
    fully vectorised: equality masks combined with lane rolls."""
    t = pl.program_id(0)
    nt = pl.num_programs(0)
    stride = pack * sub                                 # packed row width

    def tile_copy(slot, blo):
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(blo, span), :], scratch.at[slot],
            sems.at[slot])

    @pl.when(t == 0)
    def _():
        tile_copy(0, blo_ref[0]).start()

    @pl.when(t + 1 < nt)
    def _():
        tile_copy((t + 1) % 2, blo_ref[t + 1]).start()

    tile_copy(t % 2, blo_ref[t]).wait()
    tab = scratch[t % 2]                                # [span, stride] u32

    qhi = qhi_ref[:]
    qlo = qlo_ref[:]
    tile_q = qhi.shape[0]
    bucket = jax.lax.shift_right_logical(
        qhi.astype(jnp.int32), jnp.int32(32 - nbits)) \
        if nbits == 32 else (qhi >> jnp.uint32(32 - nbits)).astype(jnp.int32)
    logp = pack.bit_length() - 1
    bl = jnp.clip((bucket >> logp) - blo_ref[t], 0, span - 1)

    if ablate >= 1:
        # measurement stub (tools/probe_ablate.py): DMA + everything
        # downstream of the row-select, but the select itself replaced by
        # a broadcast of row 0 (keeps the tab dependency live)
        rows = jnp.broadcast_to(tab[0:1, :], (tile_q, stride))
    elif onehot:
        # MXU path: one-hot [tile, span] int8 @ table byte-planes
        span_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, span), 1)
        oh = (span_ids == bl[:, None]).astype(jnp.int8)
        rows = jnp.zeros((tile_q, stride), jnp.uint32)
        for shift in range(4):
            plane = ((tab >> jnp.uint32(8 * shift)) & jnp.uint32(0xFF)
                     ).astype(jnp.int8)
            part = jax.lax.dot_general(
                oh, plane, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            # int8 is signed: bytes >= 128 came out negative — re-truncate
            byte = part.astype(jnp.uint32) & jnp.uint32(0xFF)
            rows = rows | (byte << jnp.uint32(8 * shift))
    else:
        # per-lane dynamic gather along the sublane axis: Mosaic lowers
        # take_along_axis (jnp.take's arbitrary gather it rejects)
        blx = jnp.broadcast_to(bl[:, None], (tile_q, stride))
        rows = jnp.take_along_axis(tab, blx, axis=0)    # [tile, stride]

    if ablate >= 2:
        # DMA-only stub: skip the match/roll tail too
        out_ref[:] = jnp.broadcast_to(rows[0:1, 0:1], (nwords, tile_q))
        return

    slot_w = 2 + nwords
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, stride), 1)
    sub_lane = lane % sub                               # lane within bucket
    is_hi = (sub_lane % slot_w == 0) & (sub_lane < cap * slot_w)
    # minor-dim insertion on i1 vectors is unsupported (Mosaic): build the
    # column vectors from the 32-bit operands and compare in 2D
    qhi_c = qhi[:, None]                                # [tile, 1] u32
    qlo_c = qlo[:, None]
    sent = jnp.uint32(0xFFFFFFFF)
    valid = ~((qhi_c == sent) & (qlo_c == sent))        # [tile, 1] i1

    # pltpu.roll requires non-negative shifts: shift by stride-s to read
    # lane l+s (mod stride); slots never straddle a bucket boundary, so
    # wrapped reads only ever land on is_hi=False lanes
    rows_next = pltpu.roll(rows, stride - 1, axis=1)    # lane l <- rows[l+1]
    hit = (rows == qhi_c) & (rows_next == qlo_c) & is_hi & valid

    accs = []
    for w in range(nwords):
        mvals = pltpu.roll(rows, stride - (2 + w), axis=1)
        # lane reduction as int32 (exactly one slot hits, so the "sum" is a
        # select; int32 add is bitwise-identical to u32 add and Mosaic has
        # no unsigned accumulators)
        sel = jnp.where(hit, mvals.astype(jnp.int32), jnp.int32(0))
        accs.append(jnp.sum(sel, axis=1).astype(jnp.uint32))
    out_ref[:] = jnp.stack(accs, axis=0)                # [W, tile]


def probe_sorted(qhi: jax.Array, qlo: jax.Array, blo: jax.Array,
                 table: jax.Array, nbits: int, cap: int, nwords: int,
                 span: int = SPAN, pack: int = 1,
                 onehot: bool | None = None, tile_q: int = TILE_Q,
                 ablate: int = 0):
    """qhi/qlo u32 [Q] (grouped by bucket ascending), blo i32 [Q/tile_q]
    (first clamped packed-row index per tile), table u32 [B/pack,
    pack*sub] (pack adjacent buckets per row) -> rows u32 [W, Q].
    Requires Q % tile_q == 0 and every tile's packed rows within
    [blo[t], blo[t] + span) — the caller (bucket_query_sorted) checks the
    span and patches the out-of-span tail (or falls back entirely)."""
    if onehot is None:
        env = os.environ.get("PANAGRAM_TPU_PROBE_ONEHOT")
        if env is not None:
            onehot = env == "1"
        else:
            # on hardware Mosaic's dynamic_gather cannot cross vregs along
            # the gather dim (span rows >> 8 sublanes), so the MXU one-hot
            # matmul is the only viable in-VMEM row select; the interpreter
            # takes the cheap take_along_axis path
            onehot = not _interpret()
    Q = qhi.shape[0]
    stride = table.shape[1]
    assert stride % pack == 0
    ntiles = Q // tile_q
    kern = partial(_probe_kernel, nbits=nbits, cap=cap,
                   sub=stride // pack, pack=pack,
                   nwords=nwords, span=span, onehot=onehot, ablate=ablate)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec((tile_q,), lambda t, blo: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q,), lambda t, blo: (t,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((nwords, tile_q), lambda t, blo: (0, t),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, span, stride), jnp.uint32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    with jax.enable_x64(False):
        return pl.pallas_call(
            kern,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nwords, Q), jnp.uint32),
            interpret=_interpret(),
        )(blo, qhi, qlo, table)


# ---------------------------------------------------------------------------
# Fused pack+mix kernel: 2-bit packed bases -> splitmix64-mixed (qhi, qlo)
# u32 pairs, entirely in u32 arithmetic inside VMEM.
#
# The XLA path (codec.pack_kmers_packed + lookup.mix64) costs ~12-15 ms per
# 4M chunk: every op runs in emulated u64 with fusion breaks between the
# byte-slice phases (measured via tools/chunk_ablate.py).  This kernel does
# the window build, canonicalization (rev-complement min), validity, and
# the splitmix64 finalizer (16-bit-limb u64 multiplies — Mosaic's u32
# multiply is exact mod 2^32, tools/mosaic_probe.py) in one VMEM pass:
# ~95 u32 ops/position ~ well under 1 ms/4M.
#
# Outputs are PHASE-MAJOR: out[r, j] is position 16*j + r (each u32 of the
# packed stream carries 16 bases).  The merge-probe consumer sorts queries
# anyway, so it simply carries the true position (16*(i%J) + i//J ... see
# pack_mix_positions) as the sort payload instead of arange.
# ---------------------------------------------------------------------------

_MIX_M1 = 0xBF58476D1CE4E5B9
_MIX_M2 = 0x94D049BB133111EB
# mix64 of the SENTINEL canon (invalid windows), as (hi, lo) u32 constants
_SENT_MIX = 0xB4D055FCF2CBBD7B  # == mix64_np(0xFFFFFFFFFFFFFFFF)


def _mul64_const(hi, lo, const: int):
    """(hi, lo) u32 pair * 64-bit constant, mod 2^64 — 16-bit-limb
    schoolbook on the low x low product (needs its high half), low-only
    multiplies for the cross terms."""
    c_lo = np.uint32(const & 0xFFFFFFFF)
    c_hi = np.uint32(const >> 32)
    b0 = np.uint32(const & 0xFFFF)
    b1 = np.uint32((const >> 16) & 0xFFFF)
    a0 = lo & jnp.uint32(0xFFFF)
    a1 = lo >> jnp.uint32(16)
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + (p00 >> jnp.uint32(16))
    mid2 = p10 + (mid & jnp.uint32(0xFFFF))
    lo_res = (mid2 << jnp.uint32(16)) | (p00 & jnp.uint32(0xFFFF))
    hi_res = (p11 + (mid >> jnp.uint32(16)) + (mid2 >> jnp.uint32(16))
              + lo * c_hi + hi * c_lo)
    return hi_res, lo_res


def _xorshift64(hi, lo, s: int):
    """(hi, lo) ^= (hi, lo) >> s for 0 < s < 64 (splitmix uses 30/27/31)."""
    if s < 32:
        nlo = (lo >> jnp.uint32(s)) | (hi << jnp.uint32(32 - s))
        nhi = hi >> jnp.uint32(s)
    else:
        nlo = hi >> jnp.uint32(s - 32)
        nhi = jnp.zeros_like(hi)
    return hi ^ nhi, lo ^ nlo


def _mix64_pair(hi, lo):
    hi, lo = _xorshift64(hi, lo, 30)
    hi, lo = _mul64_const(hi, lo, _MIX_M1)
    hi, lo = _xorshift64(hi, lo, 27)
    hi, lo = _mul64_const(hi, lo, _MIX_M2)
    return _xorshift64(hi, lo, 31)


def _rev32_pairs(x):
    """Reverse the order of the 16 2-bit pairs within a u32."""
    m = jnp.uint32(0x0000FFFF)
    x = ((x & m) << jnp.uint32(16)) | ((x >> jnp.uint32(16)) & m)
    m = jnp.uint32(0x00FF00FF)
    x = ((x & m) << jnp.uint32(8)) | ((x >> jnp.uint32(8)) & m)
    m = jnp.uint32(0x0F0F0F0F)
    x = ((x & m) << jnp.uint32(4)) | ((x >> jnp.uint32(4)) & m)
    m = jnp.uint32(0x33333333)
    x = ((x & m) << jnp.uint32(2)) | ((x >> jnp.uint32(2)) & m)
    return x


def _pack_mix_kernel(a_ref, b_ref, c_ref, nma_ref, nmb_ref,
                     ohi_ref, olo_ref, *, k: int, P: int, tj: int):
    """One grid step: tj u32 groups of the packed stream (16 positions
    each) -> mixed (hi, lo) for the 16 phases."""
    A = a_ref[:]                                     # [8, 128] u32
    B = b_ref[:]
    C = c_ref[:]
    NMa = nma_ref[:]
    NMb = nmb_ref[:]
    t = pl.program_id(0)

    two_k = 2 * k
    if two_k >= 32:
        lo_mask = jnp.uint32(0xFFFFFFFF)
        hi_mask = jnp.uint32((1 << (two_k - 32)) - 1)
    else:
        lo_mask = jnp.uint32((1 << two_k) - 1)
        hi_mask = jnp.uint32(0)
    kmask = jnp.uint32((1 << k) - 1)
    sh = 64 - two_k
    s_hi = jnp.uint32(_SENT_MIX >> 32)
    s_lo = jnp.uint32(_SENT_MIX & 0xFFFFFFFF)
    S32 = jnp.uint32(0xFFFFFFFF)

    # global group index of each element (for the >= P pad marking)
    sub = jax.lax.broadcasted_iota(jnp.int32, A.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, A.shape, 1)
    jglob = t * tj + sub * 128 + lane

    for r in range(16):
        s = 2 * r
        if r == 0:
            wlo, whi = A, B
            vbits = NMa
        else:
            wlo = (A >> jnp.uint32(s)) | (B << jnp.uint32(32 - s))
            whi = (B >> jnp.uint32(s)) | (C << jnp.uint32(32 - s))
            vbits = (NMa >> jnp.uint32(r)) | (NMb << jnp.uint32(32 - r))
        wlo = wlo & lo_mask
        whi = whi & hi_mask
        bad = (vbits & kmask) != jnp.uint32(0)

        rc_lo = (~wlo) & lo_mask
        rc_hi = (~whi) & hi_mask
        r_hi = _rev32_pairs(wlo)                     # rev64 swaps halves
        r_lo = _rev32_pairs(whi)
        if sh == 0:
            fhi, flo = r_hi, r_lo
        elif sh < 32:
            flo = (r_lo >> jnp.uint32(sh)) | (r_hi << jnp.uint32(32 - sh))
            fhi = r_hi >> jnp.uint32(sh)
        else:
            flo = r_hi >> jnp.uint32(sh - 32)
            fhi = jnp.zeros_like(r_hi)

        take_f = (fhi < rc_hi) | ((fhi == rc_hi) & (flo <= rc_lo))
        chi = jnp.where(take_f, fhi, rc_hi)
        clo = jnp.where(take_f, flo, rc_lo)

        mhi, mlo = _mix64_pair(chi, clo)
        mhi = jnp.where(bad, s_hi, mhi)
        mlo = jnp.where(bad, s_lo, mlo)
        # positions past P are PADDING: the all-ones reserved pair (what
        # bucket_query_sorted appends host-side on the XLA path)
        pad = (jglob * 16 + r) >= P
        ohi_ref[r] = jnp.where(pad, S32, mhi)
        olo_ref[r] = jnp.where(pad, S32, mlo)


def pack_mix_pallas(packed: jax.Array, nmask: jax.Array, L: int, k: int,
                    Ppad: int):
    """packed u8 [>= ceil(L/4)] (pack_bases_np layout), nmask u8
    [>= ceil(L/8)] -> (mhi, mlo) u32 [16, J] PHASE-MAJOR mixed queries,
    J = Ppad // 16; flat index i <-> position 16*(i % J) + i // J.
    Positions >= L-k+1 carry the all-ones padding pair.  Ppad must be a
    multiple of 16*1024."""
    P = L - k + 1
    J = Ppad // 16
    assert J % 1024 == 0
    TJ = 1024                                        # groups per grid step

    # XLA-side input prep (one fused elementwise pass):
    # A/B/C = u32 groups j, j+1, j+2 of the packed stream; NMa/NMb = the
    # 48-bit validity window bits 16j.. as (u32, u32>>... ) per group
    nb = packed.shape[0]
    need_b = 4 * (J + 2)
    p = packed
    if nb < need_b:
        p = jnp.concatenate([p, jnp.zeros(need_b - nb, jnp.uint8)])
    p32 = jax.lax.bitcast_convert_type(
        p[: 4 * (J + 2)].reshape(J + 2, 4), jnp.uint32).reshape(J + 2)
    A = jax.lax.slice(p32, (0,), (J,))
    B = jax.lax.slice(p32, (1,), (J + 1,))
    C = jax.lax.slice(p32, (2,), (J + 2,))

    nm = nmask
    need_m = 2 * (J + 2)
    if nm.shape[0] < need_m:
        # pad with 0xFF: windows past the real sequence are invalid
        nm = jnp.concatenate(
            [nm, jnp.full(need_m - nm.shape[0], 0xFF, jnp.uint8)])
    m16 = jax.lax.bitcast_convert_type(
        nm[: 2 * (J + 2)].reshape(J + 2, 2), jnp.uint16).reshape(J + 2)
    m32 = m16.astype(jnp.uint32)
    NMa = jax.lax.slice(m32, (0,), (J,)) \
        | (jax.lax.slice(m32, (1,), (J + 1,)) << jnp.uint32(16))
    NMb = jax.lax.slice(m32, (2,), (J + 2,))

    Jr = J // 128
    shape2 = (Jr, 128)
    ins = [x.reshape(shape2) for x in (A, B, C, NMa, NMb)]
    grid = J // TJ
    blk = pl.BlockSpec((TJ // 128, 128), lambda t: (t, 0),
                       memory_space=pltpu.VMEM)
    oblk = pl.BlockSpec((16, TJ // 128, 128), lambda t: (0, t, 0),
                        memory_space=pltpu.VMEM)
    kern = partial(_pack_mix_kernel, k=k, P=P, tj=TJ)
    with jax.enable_x64(False):
        ohi, olo = pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[blk] * 5,
            out_specs=(oblk, oblk),
            out_shape=(
                jax.ShapeDtypeStruct((16, Jr, 128), jnp.uint32),
                jax.ShapeDtypeStruct((16, Jr, 128), jnp.uint32),
            ),
            interpret=_interpret(),
        )(*ins)
    return ohi.reshape(16, J), olo.reshape(16, J)


def pack_mix_positions(Ppad: int):
    """True position of each flat element of pack_mix_pallas output:
    pos[i] = 16 * (i % J) + i // J, as int32 [Ppad]."""
    J = Ppad // 16
    r = jnp.arange(16, dtype=jnp.int32)[:, None]
    j = jnp.arange(J, dtype=jnp.int32)[None, :]
    return (16 * j + r).reshape(Ppad)


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
