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

    wg_png, wg_map = plots.whole_genome_plot(view_index, "g0")
    cv_png, cv_map = plots.chromosome_view(view_index, "g0", "chr1", 100,
                                           2000)
    cw_png, cw_map = plots.chr_whole_plot(view_index, "g0", "chr1", 100,
                                          2000)
    pngs = [
        plots.pangenome_composition(view_index),
        plots.genome_dendrogram(view_index),
        plots.chromosome_histograms(view_index),
        plots.genome_sizes_plot(view_index),
        plots.gene_content_plot(view_index, "g0"),
        plots.umap_scatter(view_index, "g0"),
        wg_png, cv_png, cw_png,
    ]
    for png in pngs:
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert len(png) > 2000

    # click-through maps: every chromosome band is a pixel bbox inside the
    # image, carrying its data range
    assert [r["chrom"] for r in wg_map["rows"]] == ["chr1"]
    r = wg_map["rows"][0]
    assert 0 <= r["px0"] < r["px1"] <= wg_map["w"]
    assert 0 <= r["py0"] < r["py1"] <= wg_map["h"]
    assert r["size"] == 2500 - K + 1

    assert cv_map["start"] == 100 and cv_map["end"] == 2000
    assert {r["panel"] for r in cv_map["rows"]} == {
        "occupancy", "heatmap", "tracks"}
    assert len(cv_map["bins_x"]) == len(cv_map["mean_occ"]) > 0
    assert cv_map["labels"]  # heatmap row labels present
    assert cw_map["rows"][0]["chrom"] == "chr1"


def test_chromosome_view_collapse_and_types(view_index):
    """Collapsing the tree root merges all heatmap rows into one; type
    filters drop annotation tracks without breaking rendering."""
    from panagram_tpu.view import plots

    _, full = plots.chromosome_view(view_index, "g0", "chr1")
    if full["tree"] is None or "children" not in full["tree"]:
        pytest.skip("no linkage tree for this tiny index")
    root = full["tree"]["id"]
    png, m = plots.chromosome_view(view_index, "g0", "chr1",
                                   collapse={root})
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert m["labels"] == ["[3 genomes]"]

    png2, m2 = plots.chromosome_view(view_index, "g0", "chr1", types=set())
    assert png2[:8] == b"\x89PNG\r\n\x1a\n"


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

        # navigation state machine: map endpoints for click-through/zoom
        st, body, ct = get("/api/view/g0/chr1?start=0&end=1000")
        vm = json.loads(body)
        assert vm["start"] == 0 and vm["end"] == 1000
        assert {r["panel"] for r in vm["rows"]} >= {"occupancy", "heatmap"}

        st, body, ct = get("/api/map/anchor/g0")
        am = json.loads(body)
        assert am["rows"][0]["chrom"] == "chr1"

        st, body, ct = get("/api/map/chrom/g0/chr1?start=100&end=900")
        cm = json.loads(body)
        assert cm["rows"][0]["size"] == 2500 - K + 1

        # annotation-type filter + tree collapse round-trip through the URL
        st, body, ct = get(
            "/plot/chrom/g0/chr1/view.png?start=0&end=1000&types=gene")
        assert st == 200 and ct == "image/png"
        if vm.get("tree") and "children" in vm["tree"]:
            root = vm["tree"]["id"]
            st, body, ct = get(
                f"/api/view/g0/chr1?start=0&end=1000&collapse={root}")
            assert json.loads(body)["labels"] == ["[3 genomes]"]

        # gene table with substring search
        st, body, ct = get("/api/genes?genome=g0&chrom=chr1&start=0&end=2000")
        genes = json.loads(body)
        assert genes and genes[0]["name"] == "G1"
        assert {"unique", "universal"} <= set(genes[0])
        st, body, ct = get(
            "/api/genes?genome=g0&chrom=chr1&start=0&end=2000&q=zzz")
        assert json.loads(body) == []

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
