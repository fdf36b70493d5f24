"""BGZF (block-gzip) reader/writer with .gzi index support.

The reference tool relies on htslib's BGZF + ``bgzip -rI``-style ``.gzi``
virtual-offset indexes for random access into the pan-kmer bitmap
(reference panagram/index.py:539-543,793-799,827-845 and cpp/anchor.cpp:46-54,
102-106).  Neither htslib, pysam, nor Bio.bgzf are available here, so this is
a from-scratch implementation of the same on-disk format:

* each block is an independent gzip member with a BC extra subfield holding
  the compressed block size; uncompressed payload <= 65280 bytes per block;
* the file ends with the standard 28-byte BGZF EOF marker;
* the ``.gzi`` index is ``(n_entries: u64, [compressed_off: u64,
  uncompressed_off: u64] * n_entries)`` listing the start of every block
  after the first (the reference reader prepends an implicit (0, 0) entry,
  panagram/index.py:793-799).

A native C++ accelerator (panagram_tpu/native/bgzf_native.cpp) is used for
compression when built; this module transparently falls back to zlib.
"""

from __future__ import annotations

import io
import os
import struct
import zlib

import numpy as np

# htslib BGZF_BLOCK_SIZE = 0xff00: max uncompressed payload bytes per block.
MAX_BLOCK_DATA = 0xFF00

# Standard BGZF EOF marker (an empty block), identical to htslib's.
EOF_MARKER = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)

_HEADER = struct.Struct("<4BI2BH2BHH")  # gzip header + XLEN + BC subfield


def _block_header(bsize: int) -> bytes:
    return _HEADER.pack(
        0x1F, 0x8B, 0x08, 0x04,  # magic, deflate, FEXTRA
        0,                        # mtime
        0, 0xFF,                  # XFL, OS=unknown
        6,                        # XLEN
        0x42, 0x43,               # 'B','C'
        2,                        # SLEN
        bsize - 1,                # BSIZE (total block size minus 1)
    )


def make_virtual_offset(block_start_offset: int, within_block_offset: int) -> int:
    """Bio.bgzf-compatible virtual offset: coffset<<16 | uoffset."""
    if within_block_offset >= 65536:
        raise ValueError("within_block_offset must be < 65536")
    return (block_start_offset << 16) | within_block_offset


def split_virtual_offset(voffset: int) -> tuple[int, int]:
    return voffset >> 16, voffset & 0xFFFF


# bulk-write compression pool (write() path): blocks are independent, the
# per-block compressors release the GIL; lazily built, shared per process
_MT_MIN_BLOCKS = 8
_mt_pool_obj = None


def _mt_pool():
    global _mt_pool_obj
    if _mt_pool_obj is None:
        from concurrent.futures import ThreadPoolExecutor

        _mt_pool_obj = ThreadPoolExecutor(
            max_workers=min(4, os.cpu_count() or 1),
            thread_name_prefix="panagram-bgzf")
    return _mt_pool_obj


def _try_native():
    try:
        from ..native import bgzf_native

        return bgzf_native
    except Exception:
        return None


class BgzfWriter:
    """Streaming BGZF writer that also records the .gzi block table.

    ``write()`` accepts arbitrary bytes; blocks are cut at MAX_BLOCK_DATA.
    ``close()`` appends the EOF marker.  ``write_gzi(path)`` dumps the index
    in the layout the reference reader consumes (panagram/index.py:793-799):
    an entry for the start of every block after the first, plus a final
    entry at (end-of-data, total-uncompressed) mirroring htslib's
    bgzf_index_dump behaviour.
    """

    def __init__(self, path_or_fileobj, level: int = 6):
        if isinstance(path_or_fileobj, (str, os.PathLike)):
            self._fh = open(path_or_fileobj, "wb")
            self._own = True
        else:
            self._fh = path_or_fileobj
            self._own = False
        self.level = level
        self._buf = bytearray()
        self._coffset = 0  # compressed bytes written
        self._uoffset = 0  # uncompressed bytes consumed
        # block starts *after* block 0: list of (coffset, uoffset)
        self._blocks: list[tuple[int, int]] = []
        self._native = _try_native()
        self._closed = False

    def write(self, data) -> int:
        """Append any bytes-like or buffer-protocol object (e.g. a uint8
        ndarray, possibly multi-dimensional); returns BYTES written."""
        if not isinstance(data, (bytes, bytearray)):
            # memoryview normalizes ndarrays (a bare ndarray would
            # dispatch to numpy's broadcasting +=) and exposes nbytes;
            # non-contiguous views must flatten through tobytes
            data = memoryview(data)
            if not data.c_contiguous:
                data = data.tobytes()
        n = data.nbytes if isinstance(data, memoryview) else len(data)
        self._buf += data
        nblocks = len(self._buf) // MAX_BLOCK_DATA
        if nblocks >= _MT_MIN_BLOCKS:
            # bulk path: BGZF blocks are independent deflate streams, and
            # both the native compressor (ctypes) and zlib release the
            # GIL — compressing large writes on a small pool keeps the
            # anchor drain from serializing behind compression.  Output
            # bytes are IDENTICAL to the serial path (same per-block
            # compressor, order preserved by pool.map).
            span = nblocks * MAX_BLOCK_DATA
            raw = bytes(self._buf[:span])
            del self._buf[:span]
            chunks = [raw[i * MAX_BLOCK_DATA:(i + 1) * MAX_BLOCK_DATA]
                      for i in range(nblocks)]
            for i, block in enumerate(
                    _mt_pool().map(self._compress_one, chunks)):
                self._fh.write(block)
                self._coffset += len(block)
                self._uoffset += MAX_BLOCK_DATA
                self._blocks.append((self._coffset, self._uoffset))
        while len(self._buf) >= MAX_BLOCK_DATA:
            self._flush_block(bytes(self._buf[:MAX_BLOCK_DATA]))
            del self._buf[:MAX_BLOCK_DATA]
        return n

    def _compress_one(self, data: bytes) -> bytes:
        if self._native is not None:
            return self._native.compress_block(data, self.level)
        co = zlib.compressobj(self.level, zlib.DEFLATED, -15)
        payload = co.compress(data) + co.flush()
        bsize = len(payload) + 26
        if bsize > 65536:
            co = zlib.compressobj(0, zlib.DEFLATED, -15)
            payload = co.compress(data) + co.flush()
            bsize = len(payload) + 26
        return (_block_header(bsize) + payload
                + struct.pack("<II", zlib.crc32(data), len(data)))

    def _flush_block(self, data: bytes):
        block = self._compress_one(data)
        self._fh.write(block)
        self._coffset += len(block)
        self._uoffset += len(data)
        self._blocks.append((self._coffset, self._uoffset))

    def flush(self):
        if self._buf:
            self._flush_block(bytes(self._buf))
            self._buf.clear()

    @property
    def block_table(self) -> list[tuple[int, int]]:
        return list(self._blocks)

    def write_gzi(self, path: str):
        # Drop the final entry? htslib dumps noffs-1 entries skipping the
        # implicit (0,0); the last recorded entry points at end-of-data which
        # htslib also records (index entry added per flushed block).  The
        # reference reader handles either; we keep all entries except when
        # the file is empty.
        entries = self._blocks
        with open(path, "wb") as f:
            f.write(struct.pack("<Q", len(entries)))
            for c, u in entries:
                f.write(struct.pack("<QQ", c, u))

    def close(self):
        if self._closed:
            return
        self.flush()
        self._fh.write(EOF_MARKER)
        self._closed = True
        if self._own:
            self._fh.close()
        else:
            self._fh.flush()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class BgzfPieceWriter:
    """Per-host writer for sharded multi-process bitmap builds.

    Each host of a multi-host mesh build owns an interleaved subset of the
    bitmap's rows (its devices' slices of every chunk).  write_piece()
    appends one contiguous run of rows as WHOLE BGZF blocks (flushed at the
    piece boundary) and records where the run belongs in the final
    uncompressed stream; stitch_bgzf_pieces() later byte-concatenates all
    hosts' pieces in stream order — no recompression — and appends the one
    EOF marker.  The stitched file differs from a single-writer file only
    in block framing; decompressed bytes are identical (the parity contract
    of SURVEY §2.4: content, not gzip framing).
    """

    def __init__(self, path: str, level: int = 6):
        self.path = str(path)
        self._w = BgzfWriter(path, level)
        # (uncompressed_start_in_final_stream, compressed_off,
        #  compressed_len, uncompressed_len)
        self.manifest: list[tuple[int, int, int, int]] = []

    def write_piece(self, u_start: int, data):
        w = self._w
        c0 = w._coffset
        n = w.write(data)
        if n == 0:
            return
        w.flush()
        self.manifest.append((u_start, c0, w._coffset - c0, n))

    def close(self):
        """Flush (pieces are already block-aligned) and close WITHOUT the
        EOF marker — the stitched output gets exactly one — then persist
        the manifest next to the piece file."""
        w = self._w
        w.flush()
        if w._own:
            w._fh.close()
        w._closed = True
        arr = np.asarray(self.manifest, dtype="<u8").reshape(-1, 4)
        np.save(self.path + ".manifest.npy", arr)


def stitch_bgzf_pieces(piece_paths: list, out_path: str,
                       gzi_path: str | None = None) -> int:
    """Merge per-host BGZF piece files (written by BgzfPieceWriter) into
    one position-ordered BGZF file + .gzi.  Pieces are whole-block runs
    tagged with their uncompressed stream offsets, so the merge is a raw
    byte concatenation in manifest order; contiguity of the uncompressed
    coverage is verified so a missing piece fails loudly.  Returns the
    total uncompressed size."""
    runs = []  # (u_start, piece_path, comp_off, comp_len, u_len)
    for p in piece_paths:
        man = np.load(str(p) + ".manifest.npy")
        for u_start, c_off, c_len, u_len in man:
            runs.append((int(u_start), str(p), int(c_off), int(c_len),
                         int(u_len)))
    runs.sort(key=lambda r: r[0])
    tmp = str(out_path) + f".tmp.{os.getpid()}"
    total_u = 0
    handles: dict[str, io.BufferedReader] = {}
    try:
        with open(tmp, "wb") as out:
            for u_start, path, c_off, c_len, u_len in runs:
                if u_start != total_u:
                    raise ValueError(
                        f"{out_path}: piece coverage gap at uncompressed "
                        f"offset {total_u} (next piece starts {u_start})")
                fh = handles.get(path)
                if fh is None:
                    fh = handles[path] = open(path, "rb")
                fh.seek(c_off)
                remaining = c_len
                while remaining:
                    buf = fh.read(min(remaining, 1 << 20))
                    if not buf:
                        raise ValueError(f"{path}: truncated piece file")
                    out.write(buf)
                    remaining -= len(buf)
                total_u += u_len
            out.write(EOF_MARKER)
    finally:
        for fh in handles.values():
            fh.close()
    os.replace(tmp, out_path)
    build_gzi(out_path, gzi_path)
    return total_u


def load_gzi(path: str) -> np.ndarray:
    """Load a .gzi index into the same structured array layout as the
    reference's Genome.load_bgz_blocks (panagram/index.py:793-799):
    a (nblocks+1)-entry array with an implicit leading (0, 0)."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        dtype = np.dtype([("rstart", "<u8"), ("dstart", "<u8")])
        entries = np.fromfile(f, dtype, n)
    blocks = np.zeros(int(n) + 1, dtype=dtype)
    blocks[1:] = entries
    return blocks.astype([("rstart", int), ("dstart", int)])


class BgzfReader:
    """Random-access BGZF reader.

    Supports ``seek(virtual_offset)`` + ``read(n)`` like Bio.bgzf.BgzfReader
    (the API the reference query path uses, panagram/index.py:837-838), plus
    convenience ``read_at(uoffset, n)`` when a block table is available.
    """

    def __init__(self, path: str, gzi: str | None = None):
        self._fh = open(path, "rb")
        self._block_cache_start = -1
        self._block_cache = b""
        self._within = 0
        self.blocks = load_gzi(gzi) if gzi else None

    def _load_block(self, coffset: int) -> bytes:
        if coffset == self._block_cache_start:
            return self._block_cache
        self._fh.seek(coffset)
        header = self._fh.read(18)
        if len(header) < 18:
            self._block_cache_start = coffset
            self._block_cache = b""
            return b""
        if header[0] != 0x1F or header[1] != 0x8B:
            raise ValueError(f"bad BGZF magic at offset {coffset}")
        xlen = struct.unpack("<H", header[10:12])[0]
        extra = header[12:18]
        # find BC subfield (may need more extra bytes)
        extra += self._fh.read(xlen - 6) if xlen > 6 else b""
        bsize = None
        i = 0
        while i + 4 <= len(extra):
            si1, si2, slen = extra[i], extra[i + 1], struct.unpack("<H", extra[i + 2:i + 4])[0]
            if si1 == 0x42 and si2 == 0x43 and slen == 2:
                bsize = struct.unpack("<H", extra[i + 4:i + 6])[0] + 1
                break
            i += 4 + slen
        if bsize is None:
            raise ValueError("BGZF BC subfield missing")
        payload_len = bsize - 12 - xlen - 8
        payload = self._fh.read(payload_len)
        data = zlib.decompress(payload, -15)
        self._fh.read(8)  # crc + isize
        self._block_cache_start = coffset
        self._block_cache = data
        self._next_coffset = coffset + bsize
        return data

    def seek(self, virtual_offset: int):
        coffset, within = split_virtual_offset(virtual_offset)
        self._load_block(coffset)
        self._within = within
        return virtual_offset

    def read(self, size: int) -> bytes:
        out = bytearray()
        while len(out) < size:
            data = self._block_cache
            take = data[self._within : self._within + (size - len(out))]
            out += take
            self._within += len(take)
            if len(out) < size:
                nxt = getattr(self, "_next_coffset", None)
                if nxt is None:
                    break
                data = self._load_block(nxt)
                self._within = 0
                if not data:  # EOF block
                    break
        return bytes(out)

    def read_at(self, uoffset: int, size: int) -> bytes:
        """Read ``size`` bytes starting at uncompressed offset ``uoffset``
        using the .gzi table (mirrors the reference's offset arithmetic,
        panagram/index.py:833-838)."""
        if self.blocks is None:
            raise ValueError("read_at requires a .gzi index")
        blk = np.searchsorted(self.blocks["dstart"], uoffset, side="right") - 1
        blk_offs = int(uoffset - self.blocks["dstart"][blk])
        blk_start = int(self.blocks["rstart"][blk])
        self.seek(make_virtual_offset(blk_start, blk_offs))
        return self.read(size)

    def read_all(self) -> bytes:
        """Decompress the entire file (for tests / small files)."""
        self._fh.seek(0)
        out = bytearray()
        coffset = 0
        while True:
            data = self._load_block(coffset)
            if not data:
                # empty block: EOF marker (or empty file)
                break
            out += data
            coffset = self._next_coffset
        return bytes(out)

    def close(self):
        self._fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def decompress_file(path: str) -> bytes:
    with BgzfReader(path) as r:
        return r.read_all()


def is_bgzf(path: str) -> bool:
    """True when the file starts with a BGZF block (gzip + FEXTRA with a
    'BC' subfield) — i.e. bgzip output, random-accessible; plain gzip is
    not (htslib applies the same sniff)."""
    try:
        with open(path, "rb") as f:
            header = f.read(18)
    except OSError:
        return False
    if len(header) < 18 or header[0] != 0x1F or header[1] != 0x8B \
            or not (header[3] & 0x04):
        return False
    xlen = struct.unpack("<H", header[10:12])[0]
    with open(path, "rb") as f:
        f.seek(12)
        extra = f.read(xlen)
    i = 0
    while i + 4 <= len(extra):
        si1, si2 = extra[i], extra[i + 1]
        slen = struct.unpack("<H", extra[i + 2:i + 4])[0]
        if si1 == 0x42 and si2 == 0x43 and slen == 2:
            return True
        i += 4 + slen
    return False


def build_gzi(path: str, gzi_path: str | None = None) -> str:
    """Create a .gzi for an EXISTING BGZF file (the role of ``bgzip -r``):
    walk the block headers by their BC sizes and read each member's ISIZE
    trailer — no decompression needed."""
    if gzi_path is None:
        gzi_path = str(path) + ".gzi"
    entries: list[tuple[int, int]] = []
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        coffset = 0
        uoffset = 0
        while coffset < size:
            f.seek(coffset)
            header = f.read(18)
            if len(header) < 18:
                break
            if header[0] != 0x1F or header[1] != 0x8B:
                raise ValueError(f"{path}: bad BGZF magic at {coffset}")
            xlen = struct.unpack("<H", header[10:12])[0]
            # slice the extra field to its DECLARED length: a member with
            # XLEN < 6 must not let the BC scan run over compressed payload
            # bytes (a false match would yield a bogus bsize and a silently
            # corrupt .gzi; short extras fall through to the loud ValueError)
            extra = header[12:12 + min(xlen, 6)]
            if xlen > 6:
                extra += f.read(xlen - 6)
            bsize = None
            i = 0
            while i + 4 <= len(extra):
                si1, si2 = extra[i], extra[i + 1]
                slen = struct.unpack("<H", extra[i + 2:i + 4])[0]
                if si1 == 0x42 and si2 == 0x43 and slen == 2 \
                        and i + 6 <= len(extra):
                    bsize = struct.unpack("<H", extra[i + 4:i + 6])[0] + 1
                    break
                i += 4 + slen
            if bsize is None:
                raise ValueError(f"{path}: BGZF BC subfield missing "
                                 f"at {coffset}")
            f.seek(coffset + bsize - 4)
            (isize,) = struct.unpack("<I", f.read(4))
            coffset += bsize
            uoffset += isize
            if isize == 0 and coffset >= size:
                break  # EOF marker
            entries.append((coffset, uoffset))
    tmp = gzi_path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(entries)))
        for c, u in entries:
            f.write(struct.pack("<QQ", c, u))
    os.replace(tmp, gzi_path)
    return gzi_path
