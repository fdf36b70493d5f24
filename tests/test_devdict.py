"""Device-resident dictionary builder tests."""

import numpy as np

from panagram_tpu.io.fasta import seq_to_codes
from panagram_tpu.ops.devdict import DeviceDictBuilder
from panagram_tpu.ops.lookup import mix64_np
from panagram_tpu.ops.ref_impl import build_dict_np, genome_kmer_set
from tests.conftest import random_seq

K = 13


def test_device_dict_matches_oracle(rng):
    seqs = [random_seq(rng, 1200, n_frac=0.01) for _ in range(5)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    want_keys, want_masks = build_dict_np(sets)

    b = DeviceDictBuilder(K, 5, chunk=333)  # small chunk: exercise merging
    for gid, s in enumerate(seqs):
        b.add_sequence(gid, seq_to_codes(s))
    d = b.to_host()

    assert d.key_space == "mixed"
    assert len(d) == len(want_keys)
    # compare in mixed space: sort oracle by mixed key
    mixed = mix64_np(want_keys)
    order = np.argsort(mixed)
    assert np.array_equal(d.keys, mixed[order])
    assert np.array_equal(d.masks, want_masks[order])


def test_device_dict_end_to_end_anchor(rng, tmp_path):
    """device_dict pipeline produces byte-identical bitmaps to the default."""
    from panagram_tpu.io.bgzf import decompress_file
    from panagram_tpu.pipeline import build_index

    fa_dir = tmp_path / "fa"
    fa_dir.mkdir()
    seqs = {}
    for name in ["gA", "gB", "gC"]:
        seq = random_seq(rng, 2500, n_frac=0.005)
        seqs[name] = seq
        with open(fa_dir / f"{name}.fa", "w") as f:
            f.write(f">chr1\n{seq}\n")
    samples = tmp_path / "samples.tsv"
    samples.write_text(
        "name\tfasta\n" + "\n".join(
            f"{n}\t{fa_dir}/{n}.fa" for n in seqs) + "\n")

    idx1 = build_index(str(samples), prefix=str(tmp_path / "i1"), k=K)
    idx2 = build_index(str(samples), prefix=str(tmp_path / "i2"), k=K,
                       device_dict=True)

    for g in seqs:
        a = decompress_file(str(tmp_path / "i1" / "anchor" / g / "bitmap.1.gz"))
        b = decompress_file(str(tmp_path / "i2" / "anchor" / g / "bitmap.1.gz"))
        assert a == b
        t1 = (tmp_path / "i1" / "anchor" / g / "bitsum.bins.tsv").read_text()
        t2 = (tmp_path / "i2" / "anchor" / g / "bitsum.bins.tsv").read_text()
        assert t1 == t2


def test_device_dict_long_sequence_multi_flush(rng):
    """A single sequence spanning more than FLUSH_CHUNKS chunks flushes
    mid-stream and must keep attributing later chunks to the same genome
    (regression: the flush used to null the buffered gid, crashing — or
    worse, misattributing bits — on any chromosome > FLUSH_CHUNKS*chunk)."""
    seqs = [random_seq(rng, 4000, n_frac=0.01) for _ in range(3)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    want_keys, want_masks = build_dict_np(sets)

    b = DeviceDictBuilder(K, 3, chunk=256)   # 4000 bp -> ~16 chunks, 2 flushes
    for gid, s in enumerate(seqs):
        b.add_sequence(gid, seq_to_codes(s))
    d = b.to_host()

    mixed = mix64_np(want_keys)
    order = np.argsort(mixed)
    assert np.array_equal(d.keys, mixed[order])
    assert np.array_equal(d.masks, want_masks[order])


def test_to_host_piece_streamed_prefix(rng, monkeypatch):
    """With a capacity hint far above the real key count, to_host must ship
    only the live prefix via the piece-sliced path and still reproduce the
    oracle exactly."""
    import panagram_tpu.ops.devdict as dd

    monkeypatch.setattr(dd, "_D2H_PIECE", 128)
    seqs = [random_seq(rng, 1500, n_frac=0.01) for _ in range(3)]
    sets = [genome_kmer_set([s], K) for s in seqs]
    want_keys, want_masks = build_dict_np(sets)

    b = DeviceDictBuilder(K, 3, chunk=512, capacity_hint=1 << 14)
    for gid, s in enumerate(seqs):
        b.add_sequence(gid, seq_to_codes(s))
    d = b.to_host()
    assert 128 < len(d) < (1 << 14)   # multi-piece AND capacity overshoot
    mixed = mix64_np(want_keys)
    order = np.argsort(mixed)
    assert np.array_equal(d.keys, mixed[order])
    assert np.array_equal(d.masks, want_masks[order])


def test_stream_rows_tail_clamp(monkeypatch):
    """The last piece clamps its start so the slice shape stays static;
    the overlapping rewrite must leave every prefix row correct."""
    import jax.numpy as jnp

    import panagram_tpu.ops.devdict as dd

    monkeypatch.setattr(dd, "_D2H_PIECE", 128)
    arr = jnp.arange(1000, dtype=jnp.uint32).reshape(500, 2)
    got = dd._stream_rows(arr, 450)   # 450 > 500 - 128: tail piece clamps
    assert np.array_equal(got, np.arange(900, dtype=np.uint32).reshape(450, 2))
    # degenerate cases: full count, and capacity below one piece
    assert np.array_equal(dd._stream_rows(arr, 500), np.asarray(arr))
    small = jnp.arange(64, dtype=jnp.uint64)
    assert np.array_equal(dd._stream_rows(small, 50), np.asarray(small)[:50])
