import os

import numpy as np
import pytest

from panagram_tpu.io.bgzf import (
    BgzfReader,
    BgzfWriter,
    decompress_file,
    load_gzi,
    make_virtual_offset,
)
from panagram_tpu.io.fasta import FastaFile, iter_fasta, seq_to_codes, write_fai


def test_bgzf_roundtrip(tmp_path, rng):
    data = rng.integers(0, 256, size=1_000_000, dtype=np.uint8).tobytes()
    gz = tmp_path / "x.gz"
    gzi = tmp_path / "x.gzi"
    with BgzfWriter(gz) as w:
        # write in odd-sized pieces to exercise block cutting
        for i in range(0, len(data), 37_777):
            w.write(data[i : i + 37_777])
    w.write_gzi(gzi)

    assert decompress_file(str(gz)) == data

    blocks = load_gzi(str(gzi))
    assert blocks["rstart"][0] == 0 and blocks["dstart"][0] == 0
    assert np.all(np.diff(blocks["dstart"]) > 0)

    r = BgzfReader(str(gz), str(gzi))
    for off, ln in [(0, 10), (12345, 100), (65280 - 3, 10), (999_990, 10)]:
        assert r.read_at(off, ln) == data[off : off + ln]
    r.close()


def test_bgzf_gzip_compatible(tmp_path):
    import gzip

    gz = tmp_path / "y.gz"
    payload = b"hello bgzf world" * 1000
    with BgzfWriter(gz) as w:
        w.write(payload)
    # BGZF is valid multi-member gzip
    with gzip.open(gz, "rb") as f:
        assert f.read() == payload


def test_bgzf_reader_virtual_offset(tmp_path):
    gz = tmp_path / "z.gz"
    data = bytes(range(256)) * 1000
    with BgzfWriter(gz) as w:
        w.write(data)
        blocks = w.block_table
    r = BgzfReader(str(gz))
    # seek to start of block 1
    c1 = blocks[0][0]
    u1 = blocks[0][1]
    r.seek(make_virtual_offset(c1, 5))
    assert r.read(10) == data[u1 + 5 : u1 + 15]


def test_fasta_iter_and_fai(tmp_path):
    fa = tmp_path / "g.fa"
    fa.write_text(">chr1 description here\nACGTACGTAC\nGTACGT\n>chr2\nNNACGT\n")
    recs = list(iter_fasta(fa))
    assert recs == [("chr1", "ACGTACGTACGTACGT"), ("chr2", "NNACGT")]

    write_fai(fa)
    f = FastaFile(fa)
    assert f.references == ["chr1", "chr2"]
    assert f.get_reference_length("chr1") == 16
    assert f.fetch("chr1", 2, 12) == "GTACGTACGT"
    assert f.fetch("chr2") == "NNACGT"
    assert f.fetch("chr1", 9, 16) == "CGTACGT"
    f.close()


def test_seq_to_codes():
    codes = seq_to_codes("ACGTacgtNX-")
    assert list(codes) == [0, 1, 2, 3, 0, 1, 2, 3, 4, 4, 4]


def test_tabix_roundtrip_and_large_coords(tmp_path):
    from panagram_tpu.io.tabix import TabixFile, write_tabix

    rows = [
        ("chr1", 100, 200, "a"),
        ("chr1", 150, 900, "b"),
        ("chr1", 600_000_000, 600_000_500, "distal"),  # beyond 2^29
        ("chr2", 5, 10, "c"),
    ]
    bgz = tmp_path / "t.bed.gz"
    write_tabix(rows, str(bgz))
    t = TabixFile(str(bgz))
    assert t.contigs == ["chr1", "chr2"]
    got = list(t.fetch("chr1", 120, 160))
    assert {g[3] for g in got} == {"a", "b"}
    # whole-contig fetch must include coordinates past 537 Mb
    assert {g[3] for g in t.fetch("chr1")} == {"a", "b", "distal"}
    assert list(t.fetch("chr1", 599_999_000, 700_000_000))[0][3] == "distal"
    assert list(t.fetch("chr2", 0, 100))[0][3] == "c"
    t.close()


def test_bgzf_writer_accepts_buffer_protocol(tmp_path):
    """write() must take uint8 ndarrays (incl. 2-D bitmap chunks) through
    the buffer protocol without a bytes copy — a bare ndarray must NOT
    fall through to numpy broadcasting (regression: the zero-copy bitmap
    write path)."""
    import numpy as np

    from panagram_tpu.io.bgzf import BgzfReader, BgzfWriter

    rng = np.random.default_rng(9)
    rows = rng.integers(0, 256, (70000, 4), dtype=np.uint8)
    tail = rng.integers(0, 256, 333, dtype=np.uint8)
    p = tmp_path / "buf.gz"
    w = BgzfWriter(str(p))
    w.write(rows)                    # 2-D ndarray, crosses a block boundary
    w.write(memoryview(tail))
    w.write(b"xyz")
    w.close()
    w.write_gzi(str(p) + ".gzi")

    r = BgzfReader(str(p), gzi=str(p) + ".gzi")
    want = rows.tobytes() + tail.tobytes() + b"xyz"
    assert r.read_at(0, len(want)) == want
    assert r.read_at(65534, 10) == want[65534:65544]


def test_write_fai_rejects_blank_lines_inside_sequence(tmp_path):
    """A blank line inside a record shifts all later offsets — silent
    wrong-bases territory — so write_fai must refuse (samtools faidx
    errors on such input); a trailing blank line is harmless."""
    import pytest

    from panagram_tpu.io.fasta import write_fai

    bad = tmp_path / "bad.fa"
    bad.write_text(">c\nAAAA\n\nCCCC\n")
    with pytest.raises(ValueError):
        write_fai(str(bad))

    bad2 = tmp_path / "bad2.fa"
    bad2.write_text(">c\n\nAAAA\n")
    with pytest.raises(ValueError):
        write_fai(str(bad2))

    ok = tmp_path / "ok.fa"
    ok.write_text(">c\nAAAA\nCC\n\n>d\nGGGG\n")
    write_fai(str(ok))  # trailing blank before the next record is fine


def test_build_gzi_rejects_short_xlen_member(tmp_path):
    """Regression (ADVICE r4): a mid-file gzip member whose XLEN < 6 must
    hit the loud 'BC subfield missing' error — the BC scan previously ran
    over compressed payload bytes and could false-match, writing a silently
    corrupt .gzi."""
    import struct as _struct
    import zlib

    from panagram_tpu.io.bgzf import BgzfWriter, build_gzi

    path = tmp_path / "mixed.gz"
    with BgzfWriter(str(path)) as w:       # one valid BGZF block first
        w.write(b"valid bgzf payload\n")
    raw = path.read_bytes()
    # append a conformant gzip member with FEXTRA but XLEN=2 (no BC room)
    co = zlib.compressobj(9, zlib.DEFLATED, -15)
    payload = b"plain gzip member"
    deflated = co.compress(payload) + co.flush()
    member = (b"\x1f\x8b\x08\x04" + b"\x00" * 6
              + _struct.pack("<H", 2) + b"\x42\x43"  # 'BC' but truncated
              + deflated
              + _struct.pack("<I", zlib.crc32(payload))
              + _struct.pack("<I", len(payload)))
    # splice before the EOF marker (last 28 bytes of BgzfWriter output)
    path.write_bytes(raw[:-28] + member + raw[-28:])
    with pytest.raises(ValueError, match="BC subfield missing"):
        build_gzi(str(path), str(path) + ".gzi")


def test_bgzf_fasta_random_access(tmp_path, rng):
    """bgzip-compressed FASTA gets true random access (.fai offsets in
    uncompressed space + .gzi block seek), no whole-genome load — the
    htslib/pysam behaviour (reference index.py:576).  Plain gzip still
    falls back to in-memory."""
    import gzip as _gzip

    from panagram_tpu.io.bgzf import BgzfWriter, build_gzi, is_bgzf, load_gzi
    from panagram_tpu.io.fasta import FastaFile
    from tests.conftest import random_seq

    seqs = {"chr1": random_seq(rng, 150_000), "chr2": random_seq(rng, 7000)}
    text = "".join(
        f">{n} extra comment\n"
        + "\n".join(s[i : i + 61] for i in range(0, len(s), 61)) + "\n"
        for n, s in seqs.items())

    plain = tmp_path / "g.fa"
    plain.write_text(text)
    bgz = tmp_path / "g2.fa.gz"
    with BgzfWriter(str(bgz)) as w:
        w.write(text.encode())
        w.flush()
        w.write_gzi(str(bgz) + ".gzi.writer")
    assert is_bgzf(str(bgz))
    assert not is_bgzf(str(plain))

    # gzi built by scanning the existing file == the writer's own table
    build_gzi(str(bgz), str(bgz) + ".gzi")
    got = load_gzi(str(bgz) + ".gzi")
    want = load_gzi(str(bgz) + ".gzi.writer")
    assert np.array_equal(got["rstart"], want["rstart"])
    assert np.array_equal(got["dstart"], want["dstart"])

    fb = FastaFile(str(bgz))
    assert fb._seqs is None and fb._bgzf is not None  # true random access
    fp = FastaFile(str(plain))
    assert fb.references == ["chr1", "chr2"]
    for name, s in seqs.items():
        assert fb.get_reference_length(name) == len(s)
        for start, end in ((0, 50), (64000, 66050), (len(s) - 13, len(s)),
                           (1234, 1235)):
            start = min(start, len(s) - 1)
            end = min(end, len(s))
            assert fb.fetch(name, start, end) == s[start:end]
            assert fp.fetch(name, start, end) == s[start:end]
    fb.close()
    fp.close()

    # plain (non-bgzf) gzip: in-memory fallback, same answers
    gz = tmp_path / "g3.fa.gz"
    with _gzip.open(gz, "wt") as f:
        f.write(text)
    fg = FastaFile(str(gz))
    assert fg._seqs is not None
    assert fg.fetch("chr1", 100, 160) == seqs["chr1"][100:160]
    fg.close()


def test_tabix_long_record_survives_loffset_pruning(tmp_path):
    """A record spanning INTO the query window from an earlier window must
    survive the reader's loffset pruning: the writer's loffset follows
    htslib's linear-index semantics (first record OVERLAPPING the bin's
    interval), not 'first record assigned to the bin'."""
    from panagram_tpu.io.tabix import TabixFile, write_tabix

    rows = [("chr1", 0, 100_000, "longgene")]
    rows += [("chr1", 20_000 + 10 * i, 20_050 + 10 * i, f"s{i}")
             for i in range(50)]
    bgz = tmp_path / "t.bed.gz"
    write_tabix(iter(rows), str(bgz), str(bgz) + ".csi",
                seq_col=0, beg_col=1, end_col=2)
    tf = TabixFile(str(bgz))
    got = list(tf.fetch("chr1", 20_000, 21_000))
    names = {r[3] for r in got}
    assert "longgene" in names, names          # the reproduced bug
    assert {f"s{i}" for i in range(50)} <= names
    # a query far past every record returns nothing
    assert list(tf.fetch("chr1", 500_000, 600_000)) == []
    # and one before the short records still sees the long one
    assert [r[3] for r in tf.fetch("chr1", 1_000, 1_100)] == ["longgene"]
    tf.close()


def test_bgzf_piece_writer_stitch(tmp_path, rng):
    """Multi-host sharded bitmap writes: interleaved per-host piece files
    stitch (raw block concatenation, no recompression) into one
    position-ordered BGZF stream with a working .gzi — including pieces
    larger than one BGZF block and hosts with no pieces at all."""
    from panagram_tpu.io.bgzf import (
        MAX_BLOCK_DATA,
        BgzfPieceWriter,
        BgzfReader,
        stitch_bgzf_pieces,
    )

    data = rng.integers(0, 256, 300_000, dtype=np.uint8).tobytes()
    # 3 "hosts": host 2 owns nothing (its piece file stays empty);
    # hosts 0/1 alternate runs, one of which spans multiple blocks
    cuts = [0, 70_000, 70_123, 200_000, 250_000, 300_000]  # > MAX_BLOCK_DATA run
    assert cuts[3] - cuts[2] > MAX_BLOCK_DATA
    writers = [BgzfPieceWriter(str(tmp_path / f"b.p{h}.part")) for h in range(3)]
    for i in range(len(cuts) - 1):
        writers[i % 2].write_piece(cuts[i], data[cuts[i]: cuts[i + 1]])
    for w in writers:
        w.close()

    out = tmp_path / "b.gz"
    gzi = tmp_path / "b.gzi"
    total = stitch_bgzf_pieces([w.path for w in writers], str(out), str(gzi))
    assert total == len(data)
    assert decompress_file(str(out)) == data
    r = BgzfReader(str(out), str(gzi))
    # probe across a stitch boundary and across a block boundary
    assert r.read_at(69_990, 200) == data[69_990:70_190]
    assert r.read_at(cuts[2] + MAX_BLOCK_DATA - 5, 10) == \
        data[cuts[2] + MAX_BLOCK_DATA - 5: cuts[2] + MAX_BLOCK_DATA + 5]
    r.close()

    # a coverage gap (missing piece) must fail loudly, not mis-stitch
    w0 = BgzfPieceWriter(str(tmp_path / "gap.p0.part"))
    w0.write_piece(0, data[:1000])
    w0.write_piece(2000, data[2000:3000])   # 1000..2000 missing
    w0.close()
    with pytest.raises(ValueError, match="gap"):
        stitch_bgzf_pieces([w0.path], str(tmp_path / "gap.gz"))
