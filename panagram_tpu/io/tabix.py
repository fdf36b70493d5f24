"""Tabix-style indexed BED files: BGZF compression + CSI index.

Replaces the reference's pysam.tabix_compress / tabix_index(csi=True) /
TabixFile.fetch (reference panagram/index.py:785-791,645-651,865-920) with a
from-scratch implementation of the CSI v1 format (min_shift=14, depth=5,
matching htslib defaults for `tabix --csi`).  Both the writer and the
fetch reader live here, so gene/anno queries work without pysam; the files
follow the published CSI spec so htslib-based tools can read them too.
"""

from __future__ import annotations

import struct

from .bgzf import BgzfReader, BgzfWriter, make_virtual_offset

MIN_SHIFT = 14
DEPTH = 5
# tabix preset for BED (TBX_UCSC): 0-based half-open
TBX_PRESET_BED = 0x10000


def _reg2bin(beg: int, end: int, min_shift: int = MIN_SHIFT, depth: int = DEPTH) -> int:
    end -= 1
    s = min_shift
    t = ((1 << depth * 3) - 1) // 7
    l = depth
    while l > 0:
        if beg >> s == end >> s:
            return t + (beg >> s)
        l -= 1
        s += 3
        t -= 1 << (l * 3)
    return 0


def _reg2bins(beg: int, end: int, min_shift: int = MIN_SHIFT, depth: int = DEPTH):
    """All bins that may overlap [beg, end) (CSI spec reg2bins)."""
    bins = []
    end -= 1
    l = 0
    t = 0
    s = min_shift + depth * 3
    while l <= depth:
        b = t + (beg >> s)
        e = t + (end >> s)
        bins.extend(range(b, e + 1))
        s -= 3
        t += 1 << (l * 3)
        l += 1
    return bins


def write_tabix(rows, bgz_path: str, csi_path: str | None = None,
                seq_col: int = 0, beg_col: int = 1, end_col: int = 2):
    """Write TSV rows (iterable of sequences of str-able values, sorted by
    (chrom, start)) as BGZF + .csi.  Returns (bgz_path, csi_path).

    The CSI depth grows beyond the default 5 when coordinates exceed
    2^(14+3*5) (~537 Mb) — htslib does the same for large references; the
    reader picks the depth up from the index header."""
    if csi_path is None:
        csi_path = bgz_path + ".csi"

    rows = list(rows)
    max_end = max((int(r[end_col]) for r in rows), default=0)
    depth = DEPTH
    while max_end >= 1 << (MIN_SHIFT + 3 * depth):
        depth += 1

    names: list[str] = []
    name_idx: dict[str, int] = {}
    ref_bins: list[dict[int, list[tuple[int, int]]]] = []
    # linear window index (htslib's lidx): min virtual offset of any record
    # OVERLAPPING each min_shift window — long records update every window
    # they span, so the per-bin loffset derived below never prunes them
    ref_lw: list[dict[int, int]] = []

    w = BgzfWriter(bgz_path)

    def cur_voffset() -> int:
        # data in w._buf lands in the block starting at w._coffset
        return make_virtual_offset(w._coffset, len(w._buf))

    for row in rows:
        line = "\t".join(str(x) for x in row) + "\n"
        chrom = str(row[seq_col])
        beg = int(row[beg_col])
        end = int(row[end_col])
        if chrom not in name_idx:
            name_idx[chrom] = len(names)
            names.append(chrom)
            ref_bins.append({})
            ref_lw.append({})
        vbeg = cur_voffset()
        w.write(line.encode())
        vend = cur_voffset()
        b = _reg2bin(beg, max(end, beg + 1), MIN_SHIFT, depth)
        rid = name_idx[chrom]
        ref_bins[rid].setdefault(b, []).append((vbeg, vend))
        lw = ref_lw[rid]
        for wdw in range(beg >> MIN_SHIFT,
                         (max(end, beg + 1) - 1 >> MIN_SHIFT) + 1):
            if wdw not in lw or vbeg < lw[wdw]:
                lw[wdw] = vbeg
    w.close()

    # per-reference gap-filled linear index (htslib lidx): filled[i] = min
    # voffset of records overlapping window i, forward-filled so unset
    # windows inherit the previous value (leading gaps -> 0)
    ref_lidx: list[list[int]] = []
    for lw in ref_lw:
        if not lw:
            ref_lidx.append([])
            continue
        filled = [0] * (max(lw) + 1)
        cur = 0
        for i in range(len(filled)):
            if i in lw:
                cur = lw[i]
            filled[i] = cur
        ref_lidx.append(filled)

    def _bin_loffset(rid: int, b: int) -> int:
        """htslib loffset semantics: the linear-index value at the bin's
        FIRST min_shift window — the first record overlapping the bin's
        interval, including long records indexed under ancestor bins."""
        # level of bin b: levels start at t_l = (8^l - 1) / 7
        t = 0
        level = 0
        for lvl in range(depth + 1):
            size = 1 << (3 * lvl)
            if b < t + size:
                level = lvl
                break
            t += size
        w0 = (b - t) << (3 * (depth - level))
        lidx = ref_lidx[rid]
        if not lidx:
            return 0
        return lidx[min(w0, len(lidx) - 1)]

    with open(csi_path, "wb") as f:
        f.write(b"CSI\x01")
        f.write(struct.pack("<ii", MIN_SHIFT, depth))
        nm = b"".join(n.encode() + b"\x00" for n in names)
        aux = struct.pack("<7i", TBX_PRESET_BED, seq_col + 1, beg_col + 1,
                          end_col + 1, ord("#"), 0, len(nm)) + nm
        f.write(struct.pack("<i", len(aux)))
        f.write(aux)
        f.write(struct.pack("<i", len(ref_bins)))
        for rid, bins in enumerate(ref_bins):
            f.write(struct.pack("<i", len(bins)))
            for b in sorted(bins):
                chunks = sorted(bins[b])
                merged: list[tuple[int, int]] = []
                for c in chunks:
                    if merged and c[0] <= merged[-1][1]:
                        merged[-1] = (merged[-1][0], max(merged[-1][1], c[1]))
                    else:
                        merged.append(c)
                loffset = _bin_loffset(rid, b)
                f.write(struct.pack("<IQi", b, loffset, len(merged)))
                for cb, ce in merged:
                    f.write(struct.pack("<QQ", cb, ce))
        f.write(struct.pack("<Q", 0))  # n_no_coor
    return bgz_path, csi_path


class TabixFile:
    """Minimal pysam.TabixFile equivalent: fetch(chrom, start, end) yields
    tuples of column strings."""

    def __init__(self, bgz_path: str, csi_path: str | None = None):
        if csi_path is None:
            csi_path = bgz_path + ".csi"
        self._reader = BgzfReader(bgz_path)
        self._load_csi(csi_path)

    def _load_csi(self, path: str):
        with open(path, "rb") as f:
            data = f.read()
        if data[:4] != b"CSI\x01":
            raise ValueError("not a CSI index")
        off = 4
        self.min_shift, self.depth = struct.unpack_from("<ii", data, off)
        off += 8
        (l_aux,) = struct.unpack_from("<i", data, off)
        off += 4
        aux = data[off : off + l_aux]
        off += l_aux
        preset, sc, bc, ec, meta, skip, l_nm = struct.unpack_from("<7i", aux, 0)
        self.seq_col, self.beg_col, self.end_col = sc - 1, bc - 1, ec - 1
        names = aux[28 : 28 + l_nm].split(b"\x00")[:-1]
        self.names = [n.decode() for n in names]
        self.name_idx = {n: i for i, n in enumerate(self.names)}
        (n_ref,) = struct.unpack_from("<i", data, off)
        off += 4
        # bin id -> (loffset, chunks); loffset is the virtual offset of the
        # first record overlapping the bin's interval — the CSI analogue of
        # tabix's linear index, used to prune chunks at fetch time
        self.ref_bins: list[dict[int, tuple[int, list[tuple[int, int]]]]] = []
        for _ in range(n_ref):
            (n_bin,) = struct.unpack_from("<i", data, off)
            off += 4
            bins = {}
            for _ in range(n_bin):
                b, loffset, n_chunk = struct.unpack_from("<IQi", data, off)
                off += 16
                chunks = []
                for _ in range(n_chunk):
                    cb, ce = struct.unpack_from("<QQ", data, off)
                    off += 16
                    chunks.append((cb, ce))
                bins[b] = (loffset, chunks)
            self.ref_bins.append(bins)

    @property
    def contigs(self):
        return list(self.names)

    def _read_chunk(self, cb: int, ce: int) -> bytes:
        r = self._reader
        r.seek(cb)
        out = bytearray()
        ce_block = ce >> 16
        ce_within = ce & 0xFFFF
        while True:
            cur_block = r._block_cache_start
            data = r._block_cache
            if cur_block == ce_block:
                out += data[r._within : ce_within]
                break
            out += data[r._within :]
            nxt = getattr(r, "_next_coffset", None)
            if nxt is None:
                break
            d = r._load_block(nxt)
            r._within = 0
            if not d:
                break
        return bytes(out)

    def fetch(self, chrom=None, start=None, end=None, **kw):
        if chrom is None:
            for name in self.names:
                yield from self.fetch(name)
            return
        if chrom not in self.name_idx:
            raise ValueError(f"unknown contig {chrom!r}")
        rid = self.name_idx[chrom]
        bins = self.ref_bins[rid]
        if start is None:
            start = 0
        if end is None:
            end = 1 << (self.min_shift + self.depth * 3)
        # min_off pruning (htslib hts_itr_query): the loffset of the leaf
        # bin containing `start` (walking up absent ancestors) bounds the
        # first record that can overlap — chunks entirely before it are
        # skipped and partial ones clipped, so a query near a contig's end
        # no longer scans every chunk of its coarse ancestor bins
        first_leaf = ((1 << self.depth * 3) - 1) // 7
        b = first_leaf + (start >> self.min_shift)
        min_off = 0
        while True:
            if b in bins:
                min_off = bins[b][0]
                break
            if b == 0:
                break
            b = (b - 1) >> 3
        chunks = []
        for b in _reg2bins(start, max(end, start + 1), self.min_shift, self.depth):
            if b in bins:
                chunks.extend(bins[b][1])
        pruned = []
        for cb, ce in sorted(set(chunks)):
            if ce <= min_off:
                continue
            cb = max(cb, min_off)
            # merge adjacent/overlapping chunks: one seek per run
            if pruned and cb <= pruned[-1][1]:
                pruned[-1] = (pruned[-1][0], max(pruned[-1][1], ce))
            else:
                pruned.append((cb, ce))
        for cb, ce in pruned:
            for line in self._read_chunk(cb, ce).split(b"\n"):
                if not line:
                    continue
                cols = line.decode().split("\t")
                try:
                    rbeg = int(cols[self.beg_col])
                    rend = int(cols[self.end_col])
                except (ValueError, IndexError):
                    continue
                if rbeg < end and rend > start:
                    yield tuple(cols)

    def close(self):
        self._reader.close()
