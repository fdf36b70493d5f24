"""Browser tests: plot builders + HTTP server routes."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer
from types import SimpleNamespace

import numpy as np
import pytest

from panagram_tpu.pipeline import build_index
from tests.conftest import random_seq

K = 11


@pytest.fixture(scope="module")
def view_index(tmp_path_factory):
    rng = np.random.default_rng(77)
    tmp = tmp_path_factory.mktemp("view")
    base = random_seq(rng, 2500)

    def mutate(seq, n):
        s = list(seq)
        for i in rng.choice(len(s), n, replace=False):
            s[i] = "ACGT"[rng.integers(4)]
        return "".join(s)

    fa = tmp / "fa"
    fa.mkdir()
    for i, seq in enumerate([base, mutate(base, 40), mutate(base, 80)]):
        (fa / f"g{i}.fa").write_text(f">chr1\n{seq}\n")
    gff = tmp / "g0.gff"
    gff.write_text("chr1\tsrc\tgene\t101\t700\t.\t+\t.\tID=gene1;Name=G1\n")
    samples = tmp / "samples.tsv"
    samples.write_text(
        "name\tfasta\tgff\n"
        f"g0\t{fa}/g0.fa\t{gff}\ng1\t{fa}/g1.fa\t\ng2\t{fa}/g2.fa\t\n")
    return build_index(str(samples), prefix=str(tmp / "idx"), k=K)


def test_plot_builders(view_index):
    from panagram_tpu.view import plots

    pngs = [
        plots.pangenome_composition(view_index),
        plots.genome_dendrogram(view_index),
        plots.chromosome_histograms(view_index),
        plots.genome_sizes_plot(view_index),
        plots.whole_genome_plot(view_index, "g0"),
        plots.gene_content_plot(view_index, "g0"),
        plots.umap_scatter(view_index, "g0"),
        plots.chromosome_view(view_index, "g0", "chr1", 100, 2000),
        plots.chr_whole_plot(view_index, "g0", "chr1"),
    ]
    for png in pngs:
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(png) > 2000


def test_http_server(view_index):
    from panagram_tpu.view.server import _Handler, _load_bookmarks

    _Handler.index = view_index
    _Handler.params = {"max_chr_bins": 350, "init": {}, "bookmarks": []}
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        def get(path):
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}{path}") as r:
                return r.status, r.read(), r.headers.get("Content-Type")

        st, body, ct = get("/")
        assert st == 200 and b"Pangenome" in body

        st, body, ct = get("/api/meta")
        meta = json.loads(body)
        assert meta["anchors"] == ["g0", "g1", "g2"]
        assert meta["sizes"]["g0"]["chr1"] == 2500 - K + 1

        st, body, ct = get("/plot/chrom/g0/chr1/view.png?start=0&end=1000")
        assert st == 200 and ct == "image/png"

        st, body, ct = get("/api/bitdump?genome=g0&chrom=chr1&start=0&end=5")
        assert st == 200 and body.count(b"\n") == 6  # header + 5 rows

        # unknown path -> 404
        try:
            urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
            assert False
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        httpd.shutdown()
        httpd.server_close()


def test_bookmarks(tmp_path):
    from panagram_tpu.view.server import _load_bookmarks

    bed = tmp_path / "b.bed"
    bed.write_text("chr1\t100\t200\tregion A\nchr2\t5\t50\n")
    bm = _load_bookmarks(str(bed))
    assert bm[0] == {"chrom": "chr1", "start": 100, "end": 200,
                     "name": "region A"}
    assert bm[1]["name"] is None
