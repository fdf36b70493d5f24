"""Distributed engine tests on the 8-device virtual CPU mesh.

The distributed engine (parallel/shard.py) is the PRODUCTION multi-chip
path: the last test drives the full CLI build over the mesh and requires
byte-identical index output vs the single-device build."""

import numpy as np
import pytest

from panagram_tpu.io.fasta import seq_to_codes
from panagram_tpu.ops.anchor import rle2_colsums, unpack_rle2
from panagram_tpu.ops.dictionary import build_dictionary
from panagram_tpu.ops.lookup import mix64_np
from panagram_tpu.ops.ref_impl import (
    anchor_np,
    genome_kmer_set,
    popcount_np,
)
from panagram_tpu.parallel import (
    make_halo_chunks,
    make_mesh,
    shard_dictionary,
    sharded_anchor_chunk,
    sharded_build_dictionary,
)
from tests.conftest import random_seq

K = 11
NG = 5


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    seqs = [random_seq(rng, 1200, n_frac=0.01) for _ in range(NG)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    d = build_dictionary(sets, K)
    mesh = make_mesh(8)
    sbd, pan = sharded_build_dictionary(sets, mesh, ngenomes=NG, k=K,
                                        return_host_dict=True)
    return dict(seqs=seqs, sets=sets, d=d, mesh=mesh, sbd=sbd, pan=pan)


def test_sharded_build_matches_host_merge(setup):
    """all_to_all build == host merge: shard-major gather of the mixed
    keys is globally sorted, masks aligned."""
    d, pan = setup["d"], setup["pan"]
    mixed = mix64_np(d.keys)
    order = np.argsort(mixed)
    assert pan.key_space == "mixed"
    assert np.array_equal(pan.keys, mixed[order])
    assert np.array_equal(pan.masks, d.masks[order])


def _decode(combined, counts, C, nbytes, nk, ngenomes):
    comb = np.asarray(combined)
    cnts = np.asarray(counts)
    parts_by, parts_popc = [], []
    colsums = np.zeros(ngenomes, np.int64)
    for dd in range(comb.shape[0]):
        real = min(max(nk - dd * C, 0), C)
        if real == 0:
            break
        by, popc = unpack_rle2(comb[dd], int(cnts[dd]), C, nbytes)
        parts_by.append(by[:real])
        parts_popc.append(popc[:real])
        colsums += rle2_colsums(comb[dd], int(cnts[dd]), C, ngenomes)
    return (np.concatenate(parts_by), np.concatenate(parts_popc), colsums)


@pytest.mark.parametrize("si", [0, 2])
def test_sharded_anchor_matches_oracle(setup, si):
    mesh, sbd, d = setup["mesh"], setup["sbd"], setup["d"]
    seq = setup["seqs"][si]
    codes = seq_to_codes(seq)

    want_rows = anchor_np(seq, K, d.keys, d.masks)
    want_popc = popcount_np(want_rows)
    want_bits = np.unpackbits(want_rows.astype("<u4").view(np.uint8),
                              axis=1, bitorder="little")[:, :NG]

    chunks, nk = make_halo_chunks(codes, 8, K, chunk_per_dev=160)
    combined, counts, C = sharded_anchor_chunk(mesh, sbd, chunks,
                                               capacity=160)
    by, popc, colsums = _decode(combined, counts, C, sbd.nbytes_row, nk, NG)
    want_by = np.packbits(
        np.pad(want_bits, ((0, 0), (0, 8 * sbd.nbytes_row - NG))),
        axis=1, bitorder="little")
    assert np.array_equal(by, want_by)
    assert np.array_equal(popc, want_popc)
    assert np.array_equal(colsums, want_bits.sum(axis=0))


def test_sharded_anchor_small_capacity_overflow_detectable(setup):
    """With a tiny RLE capacity the per-device counts exceed it — the
    production path then redoes the chunk at full capacity; here we only
    check overflow is visible, never silent."""
    mesh, sbd = setup["mesh"], setup["sbd"]
    codes = seq_to_codes(setup["seqs"][1])
    chunks, nk = make_halo_chunks(codes, 8, K, chunk_per_dev=160)
    _, counts, _ = sharded_anchor_chunk(mesh, sbd, chunks, capacity=8)
    assert np.asarray(counts).max() > 8


def test_shard_existing_dictionary_both_key_spaces(setup):
    """Re-sharding a host dictionary (canon or mixed keys) probes
    identically to the distributed build's tables."""
    mesh, d, pan = setup["mesh"], setup["d"], setup["pan"]
    codes = seq_to_codes(setup["seqs"][3])
    want = popcount_np(anchor_np(setup["seqs"][3], K, d.keys, d.masks))
    chunks, nk = make_halo_chunks(codes, 8, K, chunk_per_dev=160)

    for src in (d, pan):
        sbd = shard_dictionary(src, mesh)
        combined, counts, C = sharded_anchor_chunk(mesh, sbd, chunks,
                                                   capacity=160)
        _, popc, _ = _decode(combined, counts, C, sbd.nbytes_row, nk, NG)
        assert np.array_equal(popc, want), src.key_space


def test_mesh_cli_build_byte_identical(tmp_path):
    """END-TO-END: `panagram_tpu index --mesh 8` must produce an index
    byte-identical to the single-device build (VERDICT r1 item 1)."""
    from panagram_tpu.__main__ import main as cli_main
    from panagram_tpu.io.bgzf import decompress_file

    rng = np.random.default_rng(99)
    fa_dir = tmp_path / "fa"
    fa_dir.mkdir()
    base = random_seq(rng, 2500, n_frac=0.005)
    other = random_seq(rng, 900)

    def mutate(seq, n):
        s = list(seq)
        for i in rng.choice(len(s), n, replace=False):
            s[i] = "ACGT"[rng.integers(4)]
        return "".join(s)

    genomes = {
        "a1": {"c1": base, "c2": other},
        "a2": {"c1": mutate(base, 50), "c2": mutate(other, 20)},
        "a3": {"c1": mutate(base, 25)},
    }
    for name, chrs in genomes.items():
        with open(fa_dir / f"{name}.fa", "w") as f:
            for c, seq in chrs.items():
                f.write(f">{c}\n")
                for i in range(0, len(seq), 60):
                    f.write(seq[i : i + 60] + "\n")
    samples = tmp_path / "samples.tsv"
    samples.write_text("name\tfasta\n" + "".join(
        f"{n}\t{fa_dir}/{n}.fa\n" for n in genomes))

    single = tmp_path / "single"
    meshed = tmp_path / "meshed"
    cli_main(["index", str(samples), "-o", str(single), "-k", str(K)])
    cli_main(["index", str(samples), "-o", str(meshed), "-k", str(K),
              "--mesh", "8"])

    for g in genomes:
        for fn in ["bitmap.1.gz", "bitmap.100.gz"]:
            a = decompress_file(str(single / "anchor" / g / fn))
            b = decompress_file(str(meshed / "anchor" / g / fn))
            assert a == b, f"{g}/{fn}"
        for fn in ["chrs.tsv", "bitsum.bins.tsv", "total_paircounts.csv"]:
            a = (single / "anchor" / g / fn).read_bytes()
            b = (meshed / "anchor" / g / fn).read_bytes()
            assert a == b, f"{g}/{fn}"
    assert (single / "genome_dist.tsv").read_bytes() == \
        (meshed / "genome_dist.tsv").read_bytes()


def test_genome_sharded_dict_matches_oracle(setup):
    """Bit-plane sharding (SURVEY §2.7 P5): 80 genomes -> 3 mask words
    split across 8 shards; assembled byte slices and psum'd popcounts
    must equal the single-device oracle."""
    from panagram_tpu.ops.dictionary import PanKmerDict
    from panagram_tpu.ops.ref_impl import masks_to_bytes_np
    from panagram_tpu.parallel.shard import (
        assemble_genome_shards,
        genome_sharded_anchor_chunk,
        shard_dictionary_genomes,
    )

    rng = np.random.default_rng(13)
    ng = 80
    seqs = [random_seq(rng, 700, n_frac=0.01) for _ in range(ng)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    d = build_dictionary(sets, K)
    assert d.masks.shape[1] == 3  # ceil(80/32)

    mesh = setup["mesh"]
    pan = PanKmerDict(d.keys, d.masks, ng, K)
    gsd = shard_dictionary_genomes(pan, mesh)
    assert gsd.nwords_local == 1 and gsd.n_shards == 8

    seq = seqs[3] + random_seq(rng, 150, n_frac=0.1)
    codes = seq_to_codes(seq)
    by_shards, popc, colsums = genome_sharded_anchor_chunk(mesh, gsd, codes)

    want = anchor_np(seq, K, d.keys, d.masks)
    nbytes = (ng + 7) // 8
    got = assemble_genome_shards(np.asarray(by_shards), nbytes)
    assert np.array_equal(got, masks_to_bytes_np(want, nbytes))
    assert np.array_equal(np.asarray(popc), popcount_np(want))
    bits = np.unpackbits(want.astype("<u4").view(np.uint8), axis=1,
                         bitorder="little")[:, :ng]
    assert np.array_equal(np.asarray(colsums)[:ng], bits.sum(axis=0))

    # v4 palette variant: per-shard RLE slices must decode to the same
    # bytes, with shard-local popcounts summing to the global occupancy
    from panagram_tpu.ops.anchor import rle4_colsums, unpack_rle4
    from panagram_tpu.parallel.shard import genome_sharded_anchor_chunk_pal

    C = len(codes) - K + 1
    data, pal, counts, us, C2 = genome_sharded_anchor_chunk_pal(
        mesh, gsd, codes, C)
    assert C2 == C
    dnp, pnp = np.asarray(data), np.asarray(pal)
    cnts, uvals = np.asarray(counts), np.asarray(us)
    slices, popc_sum = [], np.zeros(C, np.int32)
    colsums4 = np.zeros(8 * 32, np.int64)
    for s in range(8):
        pb = pnp[s][2: 2 + int(uvals[s])]
        by_s, popc_s = unpack_rle4(dnp[s], pb, int(cnts[s]), C, 4)
        slices.append(by_s)
        popc_sum += popc_s
        colsums4[s * 32: (s + 1) * 32] = rle4_colsums(
            dnp[s], pb, int(cnts[s]), C, 32)
    assert np.array_equal(
        np.concatenate(slices, axis=1)[:, :nbytes], got)
    assert np.array_equal(popc_sum, popcount_np(want))
    assert np.array_equal(colsums4[:ng], bits.sum(axis=0))


def test_sharded_anchor_wide_masks_row_width():
    """12 genomes -> nbytes=2, where the v3 data-row width (max(1+nbytes,4)
    = 4) DIFFERS from the old 3+nbytes=5 — a hardcoded width anywhere in
    the mesh path reshapes wrong (caught once in dryrun_multichip with 34
    genomes; pinned here at the smallest differing config)."""
    rng = np.random.default_rng(13)
    ng = 12
    seqs = [random_seq(rng, 900, n_frac=0.01) for _ in range(ng)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    d = build_dictionary(sets, K)
    mesh = make_mesh(8)
    sbd, _ = sharded_build_dictionary(sets, mesh, ngenomes=ng, k=K,
                                      return_host_dict=True)

    seq = seqs[1]
    codes = seq_to_codes(seq)
    want_rows = anchor_np(seq, K, d.keys, d.masks)
    want_bits = np.unpackbits(want_rows.astype("<u4").view(np.uint8),
                              axis=1, bitorder="little")[:, :ng]

    chunks, nk = make_halo_chunks(codes, 8, K, chunk_per_dev=128)
    combined, counts, C = sharded_anchor_chunk(mesh, sbd, chunks,
                                               capacity=128)
    by, popc, colsums = _decode(combined, counts, C, sbd.nbytes_row, nk, ng)
    want_by = np.packbits(
        np.pad(want_bits, ((0, 0), (0, 8 * sbd.nbytes_row - ng))),
        axis=1, bitorder="little")
    assert np.array_equal(by, want_by)
    assert np.array_equal(popc, popcount_np(want_rows))
    assert np.array_equal(colsums, want_bits.sum(axis=0))


def test_sharded_anchor_pal_matches_oracle():
    """Protocol-v4 mesh body (per-device palette compaction): decoded
    bytes/popc/colsums must equal the oracle at 18 genomes (nbytes=3,
    the smallest v4 config)."""
    from panagram_tpu.ops.anchor import (
        PAL_CAP,
        rle4_colsums,
        unpack_rle4,
    )
    from panagram_tpu.parallel.shard import sharded_anchor_chunk_pal

    rng = np.random.default_rng(23)
    ng = 18
    seqs = [random_seq(rng, 900, n_frac=0.01) for _ in range(ng)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    d = build_dictionary(sets, K)
    mesh = make_mesh(8)
    sbd = sharded_build_dictionary(sets, mesh, ngenomes=ng, k=K)

    seq = seqs[2]
    codes = seq_to_codes(seq)
    want_rows = anchor_np(seq, K, d.keys, d.masks)
    want_bits = np.unpackbits(want_rows.astype("<u4").view(np.uint8),
                              axis=1, bitorder="little")[:, :ng]

    chunks, nk = make_halo_chunks(codes, 8, K, chunk_per_dev=128)
    data, pal, counts, us, C = sharded_anchor_chunk_pal(
        mesh, sbd, chunks, pal_work=128)
    dnp, pnp = np.asarray(data), np.asarray(pal)
    cnts, uvals = np.asarray(counts), np.asarray(us)
    assert (cnts <= 128).all() and (uvals <= PAL_CAP).all()

    nbytes = sbd.nbytes_row
    parts_by, parts_popc = [], []
    colsums = np.zeros(ng, np.int64)
    for dd in range(8):
        real = min(max(nk - dd * C, 0), C)
        if real == 0:
            break
        pal_bytes = pnp[dd][2: 2 + int(uvals[dd])]
        by, popc = unpack_rle4(dnp[dd], pal_bytes, int(cnts[dd]), C, nbytes)
        parts_by.append(by[:real])
        parts_popc.append(popc[:real])
        colsums += rle4_colsums(dnp[dd], pal_bytes, int(cnts[dd]), C, ng)
    by = np.concatenate(parts_by)
    want_by = np.packbits(
        np.pad(want_bits, ((0, 0), (0, 8 * nbytes - ng))),
        axis=1, bitorder="little")
    assert np.array_equal(by, want_by)
    assert np.array_equal(np.concatenate(parts_popc), popcount_np(want_rows))
    assert np.array_equal(colsums, want_bits.sum(axis=0))

    # palette-overflow visibility: a tiny pal_work must surface through
    # the returned counts (the production drain then redoes via v3)
    _, _, counts2, _, _ = sharded_anchor_chunk_pal(
        mesh, sbd, chunks, pal_work=4)
    assert np.asarray(counts2).max() > 4


def test_mesh_genomes_strategy_cli_byte_identical(tmp_path):
    """END-TO-END: `index --mesh 8 --mesh-strategy genomes` (mask words
    split across devices, SURVEY P5 bit-plane parallelism) must produce
    an index byte-identical to the single-device build — exercised at 34
    genomes so the mask spans two words and per-shard byte slices must
    reassemble in the reference's per-DB order."""
    from panagram_tpu.__main__ import main as cli_main
    from panagram_tpu.io.bgzf import decompress_file

    rng = np.random.default_rng(101)
    fa_dir = tmp_path / "fa"
    fa_dir.mkdir()
    base = random_seq(rng, 1100, n_frac=0.005)

    def mutate(seq, n):
        s = list(seq)
        for i in rng.choice(len(s), n, replace=False):
            s[i] = "ACGT"[rng.integers(4)]
        return "".join(s)

    names = []
    for i in range(34):
        name = f"g{i:02d}"
        names.append(name)
        seq = base if i == 0 else mutate(base, 10 + i)
        with open(fa_dir / f"{name}.fa", "w") as f:
            f.write(f">c1\n{seq}\n")
    samples = tmp_path / "samples.tsv"
    samples.write_text("name\tfasta\n" + "".join(
        f"{n}\t{fa_dir}/{n}.fa\n" for n in names))

    anchors = names[:2]
    single = tmp_path / "single"
    meshed = tmp_path / "meshed"
    meshedr = tmp_path / "meshedr"
    cli_main(["index", str(samples), "-o", str(single), "-k", str(K),
              "--anchor-genomes", *anchors])
    cli_main(["index", str(samples), "-o", str(meshed), "-k", str(K),
              "--anchor-genomes", *anchors,
              "--mesh", "8", "--mesh-strategy", "genomes"])
    # range strategy at 34 genomes: the mesh v4 palette body with W=2
    cli_main(["index", str(samples), "-o", str(meshedr), "-k", str(K),
              "--anchor-genomes", *anchors, "--mesh", "8"])

    for g in names[:2]:
        for fn in ["bitmap.1.gz", "bitmap.100.gz"]:
            a = decompress_file(str(single / "anchor" / g / fn))
            for variant in (meshed, meshedr):
                b = decompress_file(str(variant / "anchor" / g / fn))
                assert a == b, f"{variant.name}:{g}/{fn}"
        for fn in ["chrs.tsv", "bitsum.bins.tsv", "total_paircounts.csv"]:
            a = (single / "anchor" / g / fn).read_bytes()
            for variant in (meshed, meshedr):
                assert a == (variant / "anchor" / g / fn).read_bytes(), \
                    f"{variant.name}:{g}/{fn}"
