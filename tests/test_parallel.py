"""Distributed engine tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

from panagram_tpu.io.fasta import seq_to_codes
from panagram_tpu.ops.dictionary import build_dictionary
from panagram_tpu.ops.ref_impl import (
    anchor_np,
    genome_kmer_set,
    popcount_np,
)
from panagram_tpu.parallel import make_mesh, shard_dictionary, sharded_anchor_step
from panagram_tpu.parallel.shard import make_halo_chunks
from tests.conftest import random_seq

K = 11


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    seqs = [random_seq(rng, 1200, n_frac=0.01) for _ in range(5)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    d = build_dictionary(sets, K)
    mesh = make_mesh(8)
    sd = shard_dictionary(d, mesh)
    return dict(seqs=seqs, d=d, mesh=mesh, sd=sd)


def test_shard_dictionary_covers_all_keys(setup):
    sd, d = setup["sd"], setup["d"]
    keys = np.asarray(sd.keys).reshape(-1)
    keys = keys[keys != np.uint64(0xFFFFFFFFFFFFFFFF)]
    assert np.array_equal(np.sort(keys), d.keys)


def test_sharded_anchor_matches_oracle(setup):
    mesh, sd, d = setup["mesh"], setup["sd"], setup["d"]
    seq = setup["seqs"][0]
    codes = seq_to_codes(seq)

    want_rows = anchor_np(seq, K, d.keys, d.masks)
    want_popc = popcount_np(want_rows)

    chunks, nk = make_halo_chunks(codes, 8, K, chunk_per_dev=160)
    rows, popc, colsums, hist = sharded_anchor_step(mesh, sd, chunks,
                                                    binlen=40,
                                                    total_positions=nk)

    rows = np.asarray(rows)[:nk]
    popc = np.asarray(popc)[:nk]
    assert np.array_equal(rows, want_rows)
    assert np.array_equal(popc, want_popc)

    # psum'd per-genome totals == oracle column sums
    bits = np.unpackbits(want_rows.astype("<u4").view(np.uint8), axis=1,
                         bitorder="little")[:, :5]
    assert np.array_equal(np.asarray(colsums), bits.sum(axis=0))

    # histograms: concatenated local bins == global binning, including the
    # partial tail bin (halo padding must not inflate occupancy 0)
    hist = np.asarray(hist).reshape(-1, 6)
    binlen = 40
    for b in range(-(-nk // binlen)):
        seg = want_popc[b * binlen : (b + 1) * binlen]
        assert np.array_equal(hist[b], np.bincount(seg, minlength=6)), b
    assert hist[-(-nk // binlen):].sum() == 0


def test_sharded_anchor_multi_chrom_positions(setup):
    """Positions crossing device boundaries keep exact halo semantics."""
    mesh, sd, d = setup["mesh"], setup["sd"], setup["d"]
    seq = setup["seqs"][2]
    codes = seq_to_codes(seq)
    want = anchor_np(seq, K, d.keys, d.masks)
    chunks, nk = make_halo_chunks(codes, 8, K)
    rows, popc, _, _ = sharded_anchor_step(mesh, sd, chunks,
                                           binlen=chunks.shape[1] - K + 1)
    assert np.array_equal(np.asarray(rows)[:nk], want)


def test_sharded_build_dictionary(setup):
    """all_to_all hash-bucket dictionary build matches the host merge."""
    import numpy as np

    from panagram_tpu.ops.lookup import mix64_np
    from panagram_tpu.ops.ref_impl import genome_kmer_set
    from panagram_tpu.parallel.shard import sharded_build_dictionary

    mesh, d = setup["mesh"], setup["d"]
    seqs = setup["seqs"]
    sets = [genome_kmer_set([s], K) for s in seqs]
    sd = sharded_build_dictionary(sets, mesh, ngenomes=5, k=K)
    assert sd.mixed

    keys = np.asarray(sd.keys).reshape(-1)
    masks = np.asarray(sd.masks).reshape(-1, 1)
    real = keys != np.uint64(0xFFFFFFFFFFFFFFFF)
    got_keys = keys[real]
    got_masks = masks[real]

    mixed = mix64_np(d.keys)
    order = np.argsort(mixed)
    # shard-major concatenation is globally sorted in mixed space
    assert np.array_equal(got_keys, mixed[order])
    assert np.array_equal(got_masks, d.masks[order])


def test_sharded_anchor_on_sharded_build(setup):
    """End-to-end distributed: build dict via all_to_all, anchor via
    all_to_all routing, compare to the single-device oracle."""
    import numpy as np

    from panagram_tpu.io.fasta import seq_to_codes
    from panagram_tpu.ops.ref_impl import anchor_np, genome_kmer_set
    from panagram_tpu.parallel.shard import (
        make_halo_chunks,
        sharded_build_dictionary,
    )

    mesh, d = setup["mesh"], setup["d"]
    seqs = setup["seqs"]
    sets = [genome_kmer_set([s], K) for s in seqs]
    sd = sharded_build_dictionary(sets, mesh, ngenomes=5, k=K)

    seq = seqs[1]
    codes = seq_to_codes(seq)
    want = anchor_np(seq, K, d.keys, d.masks)
    chunks, nk = make_halo_chunks(codes, 8, K, chunk_per_dev=160)
    rows, popc, colsums, hist = sharded_anchor_step(mesh, sd, chunks,
                                                    binlen=40)
    assert np.array_equal(np.asarray(rows)[:nk], want)
