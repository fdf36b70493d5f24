"""Configuration: dataclasses <-> config.yaml, schema-compatible with the
reference's Index/KMC/UMAP dataclasses (reference panagram/index.py:63-138,
347-357) so existing config.yaml files load and ours are readable by the
reference viewer."""

from __future__ import annotations

import dataclasses
import os
from typing import List, Optional

import yaml


@dataclasses.dataclass
class KMCParams:
    """Counting-stage knobs (name kept for config compatibility with the
    reference's KMC section; here they budget the on-device counter)."""

    memory: int = 8           # GB budget for host-side staging
    threads: int = 1          # host IO threads
    use_existing: bool = False  # reuse cached per-genome kmer sets


@dataclasses.dataclass
class UMAPParams:
    neighbors: int = 4
    dist: float = 0
    eps: float = 1
    samples: int = 1
    bin_size: int = 100000


@dataclasses.dataclass
class IndexConfig:
    """Pan-kmer index parameters (mirrors reference Index dataclass fields)."""

    input: Optional[str] = None
    mode: Optional[str] = None
    prefix: Optional[str] = None
    k: int = 21
    cores: int = 1
    lowres_step: int = 100
    max_bin_kbp: int = 200
    min_bin_count: int = 100
    max_view_chrs: int = 50
    gff_gene_types: List[str] = dataclasses.field(default_factory=lambda: ["gene"])
    gff_anno_types: Optional[List[str]] = None
    gff_name: str = "Name"
    anchor_genomes: Optional[List[str]] = None
    prepare: bool = False
    kmc: KMCParams = dataclasses.field(default_factory=KMCParams)
    genome_umap: UMAPParams = dataclasses.field(default_factory=UMAPParams)
    chrom_umap: UMAPParams = dataclasses.field(default_factory=UMAPParams)
    # dummy fields kept for YAML-schema parity with the reference
    # (reference index.py:135-138)
    use_existing: int = 1
    threads: int = 1
    memory: int = 1

    @property
    def steps(self):
        """Bitmap resolutions (reference index.py:404-405)."""
        return (1, self.lowres_step)

    def to_dict(self, exclude=("prefix",)):
        d = dataclasses.asdict(self)
        for key in exclude:
            d.pop(key, None)
        return d

    def save(self, path: str):
        with open(path, "w") as f:
            yaml.dump(self.to_dict(), f)

    def update_from_dict(self, vals: dict):
        for key, val in vals.items():
            cur = getattr(self, key, None)
            if dataclasses.is_dataclass(cur) and isinstance(val, dict):
                for k2, v2 in val.items():
                    setattr(cur, k2, v2)
            else:
                setattr(self, key, val)

    @classmethod
    def load(cls, path: str) -> "IndexConfig":
        cfg = cls()
        with open(path) as f:
            cfg.update_from_dict(yaml.safe_load(f))
        return cfg


def config_path(prefix: str) -> str:
    return os.path.join(prefix, "config.yaml")


def samples_path(prefix: str) -> str:
    return os.path.join(prefix, "samples.tsv")
