import gzip
import os

import numpy as np
import pandas as pd
import pytest

from panagram_tpu.index import Index
from panagram_tpu.io.bgzf import decompress_file
from panagram_tpu.ops.ref_impl import (
    anchor_np,
    build_dict_np,
    genome_kmer_set,
    masks_to_bytes_np,
    popcount_np,
)
from panagram_tpu.pipeline import build_index
from tests.conftest import random_seq

K = 11
NGENOMES = 3


@pytest.fixture(scope="module")
def pan(tmp_path_factory):
    """Build a 3-genome, 2-chromosome index and the matching numpy oracle."""
    rng = np.random.default_rng(1234)
    tmp = tmp_path_factory.mktemp("pan")

    base1 = random_seq(rng, 3000)
    base2 = random_seq(rng, 1500)

    def mutate(seq, n):
        s = list(seq)
        for i in rng.choice(len(s), n, replace=False):
            s[i] = "ACGT"[rng.integers(4)]
        return "".join(s)

    genomes = {
        "g1": {"chr1": base1, "chr2": base2},
        "g2": {"chr1": mutate(base1, 60), "chr2": mutate(base2, 30)},
        "g3": {"chr1": base1[:1400] + "NN" + mutate(base1[1400:], 40)},
    }

    fa_dir = tmp / "fastas"
    fa_dir.mkdir()
    for name, chrs in genomes.items():
        with open(fa_dir / f"{name}.fa", "w") as f:
            for c, seq in chrs.items():
                f.write(f">{c} desc\n")
                for i in range(0, len(seq), 60):
                    f.write(seq[i : i + 60] + "\n")

    # simple GFF for g1 (1-based closed coords; reference uses them as-is)
    gff = fa_dir / "g1.gff"
    gff.write_text(
        "##gff-version 3\n"
        "chr1\tsrc\tgene\t101\t400\t.\t+\t.\tID=gene1;Name=GeneA\n"
        "chr1\tsrc\tmRNA\t101\t400\t.\t+\t.\tID=rna1;Parent=gene1\n"
        "chr1\tsrc\texon\t101\t220\t.\t+\t.\tID=ex1;Parent=rna1\n"
        "chr1\tsrc\texon\t300\t400\t.\t+\t.\tID=ex2;Parent=rna1\n"
        "chr2\tsrc\tgene\t51\t900\t.\t-\t.\tID=gene2\n"
        "chr2\tsrc\trepeat_region\t10\t40\t.\t+\t.\tID=rep1\n"
    )

    samples = tmp / "samples.tsv"
    samples.write_text(
        "name\tfasta\tgff\n"
        f"g1\t{fa_dir}/g1.fa\t{gff}\n"
        f"g2\t{fa_dir}/g2.fa\t\n"
        f"g3\t{fa_dir}/g3.fa\t\n"
    )

    idx_dir = tmp / "index"
    idx = build_index(str(samples), prefix=str(idx_dir), k=K)

    sets = [genome_kmer_set(list(genomes[n].values()), K) for n in ["g1", "g2", "g3"]]
    keys, masks = build_dict_np(sets)
    return dict(idx=idx, idx_dir=idx_dir, genomes=genomes, keys=keys, masks=masks)


def _oracle_bytes(pan, genome):
    out = {1: [], 100: []}
    per_chrom = {}
    for chrom, seq in pan["genomes"][genome].items():
        rows = anchor_np(seq, K, pan["keys"], pan["masks"])
        by = masks_to_bytes_np(rows, (NGENOMES + 7) // 8)
        out[1].append(by)
        out[100].append(by[::100])
        per_chrom[chrom] = rows
    return (
        np.concatenate(out[1]).tobytes(),
        np.concatenate(out[100]).tobytes(),
        per_chrom,
    )


@pytest.mark.parametrize("genome", ["g1", "g2", "g3"])
def test_bitmap_bytes_match_oracle(pan, genome):
    want1, want100, _ = _oracle_bytes(pan, genome)
    adir = pan["idx_dir"] / "anchor" / genome
    assert decompress_file(str(adir / "bitmap.1.gz")) == want1
    assert decompress_file(str(adir / "bitmap.100.gz")) == want100


def test_chrs_tsv(pan):
    df = pd.read_csv(pan["idx_dir"] / "anchor" / "g1" / "chrs.tsv", sep="\t")
    assert list(df.columns) == ["name", "id", "size", "gene_count"]
    assert df.set_index("name").loc["chr1", "size"] == 3000 - K + 1
    assert df.set_index("name").loc["chr2", "size"] == 1500 - K + 1
    assert df.set_index("name").loc["chr1", "gene_count"] == 1
    assert df.set_index("name").loc["chr2", "gene_count"] == 1


def test_bitsum_bins(pan):
    _, _, per_chrom = _oracle_bytes(pan, "g2")
    df = pd.read_csv(pan["idx_dir"] / "anchor" / "g2" / "bitsum.bins.tsv", sep="\t")
    assert list(df.columns)[:2] == ["chr", "start"]
    for cid, (chrom, rows) in enumerate(per_chrom.items()):
        popc = popcount_np(rows)
        nk = len(popc)
        binlen = nk // 100  # toy chroms: nkmers/200000 < 100
        sub = df[df["chr"] == cid]
        starts = list(sub["start"])
        assert starts == list(range(0, nk, binlen))
        for _, r in sub.iterrows():
            seg = popc[int(r["start"]) : int(r["start"]) + binlen]
            want = np.bincount(seg, minlength=NGENOMES + 1)
            got = r.iloc[2:].to_numpy().astype(int)
            assert np.array_equal(got, want)


def test_total_paircounts(pan):
    _, _, per_chrom = _oracle_bytes(pan, "g1")
    allrows = np.concatenate(list(per_chrom.values()))
    bits = np.unpackbits(allrows.astype("<u4").view(np.uint8), axis=1,
                         bitorder="little")[:, :NGENOMES]
    want = bits.sum(axis=0)
    df = pd.read_csv(pan["idx_dir"] / "anchor" / "g1" / "total_paircounts.csv",
                     index_col="name")
    assert np.array_equal(df["count"].to_numpy(), want)
    assert df["frac"]["g1"] == 1.0


def test_query_bitmap(pan):
    idx = pan["idx"]
    _, _, per_chrom = _oracle_bytes(pan, "g1")
    bits_all = np.unpackbits(
        per_chrom["chr1"].astype("<u4").view(np.uint8), axis=1, bitorder="little"
    )[:, :NGENOMES]

    df = idx.query_bitmap("g1", "chr1", 100, 600)
    assert list(df.columns) == ["g1", "g2", "g3"]
    assert np.array_equal(df.to_numpy(), bits_all[100:600])

    # lowres route: step=100 must use the bitmap.100 file
    df100 = idx.query_bitmap("g1", "chr1", 0, 2900, 100)
    assert np.array_equal(df100.to_numpy(), bits_all[0:2900:100])

    # step=200 uses lowres with stride 2
    df200 = idx.query_bitmap("g1", "chr1", 0, 2900, 200)
    assert np.array_equal(df200.to_numpy(), bits_all[0:2900:200])

    # second chromosome offsets
    bits2 = np.unpackbits(
        per_chrom["chr2"].astype("<u4").view(np.uint8), axis=1, bitorder="little"
    )[:, :NGENOMES]
    df2 = idx.query_bitmap("g1", "chr2", 7, 399)
    assert np.array_equal(df2.to_numpy(), bits2[7:399])


def test_query_genes_and_anno(pan):
    idx = pan["idx"]
    genes = idx.query_genes("g1", "chr1", 0, 3000)
    assert len(genes) == 1
    row = genes.iloc[0]
    assert row["name"] == "GeneA"
    assert row["start"] == 101 and row["end"] == 400

    # gene occupancy columns match oracle popcounts over the span
    _, _, per_chrom = _oracle_bytes(pan, "g1")
    popc = popcount_np(per_chrom["chr1"])
    hist = np.bincount(popc[101:400], minlength=NGENOMES + 1)
    assert row[1] == hist[1]
    assert row[NGENOMES] == hist[NGENOMES]

    anno = idx.query_anno("g1", "chr1", 0, 3000)
    assert set(anno["type"]) == {"exon", "mRNA"}
    # exon names resolved through Parent chain to the gene
    assert set(anno[anno["type"] == "exon"]["name"]) == {"GeneA"}

    # gene2 has no Name attr -> falls back to ID
    g2 = idx.query_genes("g1", "chr2", 0, 1500)
    assert list(g2["name"]) == ["gene2"]


def test_bitsum_genes(pan):
    df = pd.read_csv(pan["idx_dir"] / "anchor" / "g1" / "bitsum.genes.tsv", sep="\t")
    assert list(df["chr"]) == ["chr1", "chr2"]
    _, _, per_chrom = _oracle_bytes(pan, "g1")
    hist1 = np.bincount(popcount_np(per_chrom["chr1"])[101:400], minlength=NGENOMES + 1)
    got = df.set_index("chr").loc["chr1"].to_numpy().astype(int)
    assert np.array_equal(got, hist1)


def test_genome_dist(pan):
    path = pan["idx_dir"] / "genome_dist.tsv"
    assert path.exists()
    lines = [l.split("\t") for l in path.read_text().splitlines()]
    assert len(lines) == 3  # 3 unordered pairs
    for parts in lines:
        assert len(parts) == 5
        assert 0 <= float(parts[2]) <= 1


def test_index_read_aggregates(pan):
    idx = pan["idx"]
    assert idx.ngenomes == 3
    assert set(idx.anchor_genomes) == {"g1", "g2", "g3"}
    assert idx.genome_sizes.loc["g1", "length"] == (3000 - K + 1) + (1500 - K + 1)
    assert idx.genome_sizes.loc["g3", "chr_count"] == 1
    assert (idx.bitsum_totals.sum(axis=1) > 0).all()
    assert np.allclose(idx.bitfreq_totals.sum(axis=1), 1.0)


def test_bitmap_to_bins(pan):
    idx = pan["idx"]
    bm = idx.query_bitmap("g1", "chr1", 0, 2000)
    pancount, paircount = idx.bitmap_to_bins(bm, 500)
    assert pancount.shape[0] == NGENOMES + 1
    assert pancount.sum().sum() == 2000
    assert paircount.shape == (NGENOMES, 4)


def test_resume_skips_stages(pan):
    """File-based caching: rebuilding is a no-op on fresh outputs."""
    idx_dir = pan["idx_dir"]
    m0 = os.path.getmtime(idx_dir / "anchor" / "g1" / "bitmap.1.gz")
    build_index(str(idx_dir))
    assert os.path.getmtime(idx_dir / "anchor" / "g1" / "bitmap.1.gz") == m0


def test_umap_outputs(pan):
    for f in ["chrom_umaps.csv", "genome_umap.csv"]:
        df = pd.read_csv(pan["idx_dir"] / "anchor" / "g1" / f)
        assert {"start", "end", "umap1", "umap2", "cluster"} <= set(df.columns)


def test_annotate_command(pan, tmp_path):
    """Re-annotation from an existing bitmap (reference index.py:971-1010)."""
    from panagram_tpu.index import Index

    gff2 = tmp_path / "new.gff"
    gff2.write_text(
        "chr1\tsrc\tgene\t501\t900\t.\t+\t.\tID=geneX;Name=NewGene\n"
        "chr1\tsrc\texon\t501\t700\t.\t+\t.\tID=exX;Parent=geneX\n"
    )
    idx = Index(str(pan["idx_dir"]))
    idx["g2"].run_annotate(str(gff2))
    idx.close()

    idx2 = Index(str(pan["idx_dir"]))
    genes = idx2.query_genes("g2", "chr1", 0, 3000)
    assert list(genes["name"]) == ["NewGene"]
    # occupancy columns match the oracle over the (GFF-coordinate) span
    _, _, per_chrom = _oracle_bytes(pan, "g2")
    popc = popcount_np(per_chrom["chr1"])
    hist = np.bincount(popc[501:900], minlength=NGENOMES + 1)
    assert genes.iloc[0][1] == hist[1]
    assert genes.iloc[0][NGENOMES] == hist[NGENOMES]
    anno = idx2.query_anno("g2", "chr1", 0, 3000)
    assert set(anno["type"]) == {"exon"}
    idx2.close()


def test_fastq_counting(tmp_path, rng):
    """FASTQ inputs count k-mers with min-count 2 (reference -ci2,
    workflow/Snakefile:88)."""
    import gzip as _gzip

    from panagram_tpu.pipeline import _iter_fastq
    from panagram_tpu.io.fasta import seq_to_codes
    from panagram_tpu.ops.count import counted_kmers_chunked
    from panagram_tpu.ops.ref_impl import genome_kmer_set

    good = "".join(rng.choice(list("ACGT"), 300))
    err = "".join(rng.choice(list("ACGT"), 60))
    fq = tmp_path / "reads.fastq.gz"
    with _gzip.open(fq, "wt") as f:
        for i in range(3):  # the real sequence appears 3x
            f.write(f"@r{i}\n{good}\n+\n{'I' * len(good)}\n")
        f.write(f"@err\n{err}\n+\n{'I' * len(err)}\n")  # singleton errors
    codes = (seq_to_codes(seq) for _, seq in _iter_fastq(str(fq)))
    kmers = counted_kmers_chunked(codes, 11, min_count=2)
    want = genome_kmer_set([good], 11)
    # every k-mer of the 3x-covered sequence is kept
    assert np.isin(want, kmers).all()
    # error-read k-mers are kept only when they occur >= 2 times in the
    # whole input (KMC -ci2 semantics): singletons are dropped
    from panagram_tpu.ops.ref_impl import canonical_kmers_np

    canon, valid = canonical_kmers_np(err, 11)
    vals, counts = np.unique(canon[valid], return_counts=True)
    err_singletons = np.setdiff1d(vals[counts == 1], want)
    err_repeats = np.setdiff1d(vals[counts >= 2], want)
    assert not np.isin(err_singletons, kmers).any()
    assert np.isin(err_repeats, kmers).all()


def test_many_genomes_multiword_masks(tmp_path, rng):
    """34 genomes -> 2 mask words, nbytes=5 (the reference's multi-DB byte
    slice layout where the last DB contributes nbytes%4 bytes,
    index.py:940-946): full write+read path must stay byte-exact."""
    n = 34
    base = random_seq(rng, 800)

    def mutate(seq, nmut):
        s = list(seq)
        for i in rng.choice(len(s), nmut, replace=False):
            s[i] = "ACGT"[rng.integers(4)]
        return "".join(s)

    fa_dir = tmp_path / "fa"
    fa_dir.mkdir()
    seqs = {}
    for g in range(n):
        name = f"g{g:02d}"
        seqs[name] = mutate(base, 10 + g)
        (fa_dir / f"{name}.fa").write_text(f">chr1\n{seqs[name]}\n")
    samples = tmp_path / "samples.tsv"
    samples.write_text("name\tfasta\n" + "\n".join(
        f"{m}\t{fa_dir}/{m}.fa" for m in seqs) + "\n")

    idx = build_index(str(samples), prefix=str(tmp_path / "idx"), k=K,
                      anchor_genomes=["g00", "g33"])

    sets = [genome_kmer_set([s], K) for s in seqs.values()]
    keys, masks = build_dict_np(sets)
    assert masks.shape[1] == 2

    for anchor in ["g00", "g33"]:
        rows = anchor_np(seqs[anchor], K, keys, masks)
        want = masks_to_bytes_np(rows, 5)  # ceil(34/8) = 5
        got = decompress_file(
            str(tmp_path / "idx" / "anchor" / anchor / "bitmap.1.gz"))
        assert got == want.tobytes()
        df = idx.query_bitmap(anchor, "chr1", 10, 50)
        bits = np.unpackbits(rows.astype("<u4").view(np.uint8), axis=1,
                             bitorder="little")[:, :n]
        assert np.array_equal(df.to_numpy(), bits[10:50])
    # non-anchor genomes have no anchor dir
    assert not (tmp_path / "idx" / "anchor" / "g05").exists()


def test_fastq_sample_in_pipeline(tmp_path, rng):
    """A FASTQ sample contributes its presence bit but is not anchored."""
    import gzip as _gzip

    base = random_seq(rng, 1200)
    fa_dir = tmp_path / "fa"
    fa_dir.mkdir()
    (fa_dir / "asm.fa").write_text(f">chr1\n{base}\n")
    fq = fa_dir / "reads.fq.gz"
    with _gzip.open(fq, "wt") as f:
        # 2x coverage of a 400bp slice of the assembly
        for rep in range(2):
            for s in range(0, 400, 100):
                read = base[400 + s : 550 + s]
                f.write(f"@r{rep}_{s}\n{read}\n+\n{'I' * len(read)}\n")
    samples = tmp_path / "samples.tsv"
    samples.write_text(
        f"name\tfasta\nasm\t{fa_dir}/asm.fa\nreads\t{fq}\n")

    idx = build_index(str(samples), prefix=str(tmp_path / "idx"), k=K)
    assert idx.anchor_genomes == ["asm"]
    assert not (tmp_path / "idx" / "anchor" / "reads").exists()
    df = idx.query_bitmap("asm", "chr1", 0, 1100)
    # positions covered 2x by reads have the reads bit set
    assert df["reads"][500] == 1
    assert df["reads"][0] == 0
    assert (df["asm"] == 1).all()


def test_parallel_anchoring_matches_serial(tmp_path, rng):
    """cores>1 threads anchor genomes concurrently; outputs must be
    byte-identical to the serial build (thread-safe queries + writers)."""
    fa_dir = tmp_path / "fa"
    fa_dir.mkdir()
    base = random_seq(rng, 2200)

    def mutate(seq, n):
        s = list(seq)
        for i in rng.choice(len(s), n, replace=False):
            s[i] = "ACGT"[rng.integers(4)]
        return "".join(s)

    names = ["gA", "gB", "gC", "gD"]
    for i, n in enumerate(names):
        (fa_dir / f"{n}.fa").write_text(f">chr1\n{mutate(base, 20 * i)}\n")
    samples = tmp_path / "samples.tsv"
    samples.write_text("name\tfasta\n" + "\n".join(
        f"{n}\t{fa_dir}/{n}.fa" for n in names) + "\n")

    build_index(str(samples), prefix=str(tmp_path / "serial"), k=K)
    build_index(str(samples), prefix=str(tmp_path / "threads"), k=K, cores=3)

    for n in names:
        a = decompress_file(str(tmp_path / "serial" / "anchor" / n / "bitmap.1.gz"))
        b = decompress_file(str(tmp_path / "threads" / "anchor" / n / "bitmap.1.gz"))
        assert a == b
        assert ((tmp_path / "serial" / "anchor" / n / "bitsum.bins.tsv").read_text()
                == (tmp_path / "threads" / "anchor" / n / "bitsum.bins.tsv").read_text())


def test_device_chunk_rle_overflow_falls_back_dense(pan):
    """When a chunk's RLE row count exceeds the device capacity (chunk//8),
    the streaming drain must detect it via the count header and redo the
    chunk through the dense anchor_chunk_fast path — byte-identical to the
    oracle.  Forced here with a tiny chunk size (capacity 8 rows) over a
    divergent region whose runs are shorter than 8 positions."""
    from panagram_tpu.io.fasta import seq_to_codes
    from panagram_tpu.ops.dictionary import PanKmerDict
    from panagram_tpu.ops.lookup import BucketedDict

    idx = pan["idx"]
    g = idx.genomes[idx.anchor_genomes[0]]
    pan_dict = PanKmerDict.load(idx.dict_fname)
    bd = BucketedDict.build(pan_dict.keys, pan_dict.masks, g.ngenomes, K)
    (t1,) = bd.device_arrays()

    chrom, seq = next(iter(g.iter_fasta()))
    codes = seq_to_codes(seq)
    nkmers = len(codes) - K + 1
    chunk = 64
    buf = np.empty(chunk + K - 1, np.uint8)

    parts_by, parts_popc = [], []
    colsums = np.zeros(g.ngenomes, np.int64)
    for start, m, by, popc_np, cs in g._device_chunk_results(
            codes, nkmers, chunk, buf, t1, bd, capacity=8):
        parts_by.append(np.array(by, copy=True))
        parts_popc.append(np.array(popc_np, copy=True))
        colsums += cs
    rows = anchor_np(seq, K, pan["keys"], pan["masks"])
    want_by = masks_to_bytes_np(rows, g.nbytes)
    assert np.array_equal(np.concatenate(parts_by), want_by)
    assert np.array_equal(np.concatenate(parts_popc), popcount_np(rows))
    bits = np.unpackbits(rows.astype("<u4").view(np.uint8), axis=1,
                         bitorder="little")[:, : g.ngenomes]
    assert np.array_equal(colsums, bits.sum(axis=0))
