"""ctypes bindings for libbgzf_native.so (see bgzf_native.cpp).

Importing this module raises if the shared library has not been built;
panagram_tpu.io.bgzf catches that and falls back to zlib.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ._build import ensure_built

_DIR = os.path.dirname(os.path.realpath(__file__))
_LIB_PATH = os.path.join(_DIR, "libbgzf_native.so")

ensure_built(_LIB_PATH)          # fresh checkouts: build before loading
_lib = ctypes.CDLL(_LIB_PATH)    # raises OSError when not built

_lib.bgzf_compress_block.restype = ctypes.c_int
_lib.bgzf_compress_block.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
]
_lib.bgzf_decompress_block.restype = ctypes.c_int
_lib.bgzf_decompress_block.argtypes = [
    ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int,
]
_lib.bgzf_compress_buffer.restype = ctypes.c_longlong
_lib.bgzf_compress_buffer.argtypes = [
    ctypes.c_char_p, ctypes.c_longlong, ctypes.c_void_p,
    ctypes.POINTER(ctypes.c_int), ctypes.c_int,
]


def compress_block(data: bytes, level: int = 6) -> bytes:
    out = ctypes.create_string_buffer(65536)
    n = _lib.bgzf_compress_block(data, len(data), out, level)
    if n < 0:
        raise RuntimeError("bgzf_compress_block failed")
    return out.raw[:n]


def decompress_block(payload: bytes, isize: int) -> bytes:
    out = ctypes.create_string_buffer(max(isize, 1))
    n = _lib.bgzf_decompress_block(payload, len(payload), out, len(out))
    if n < 0:
        raise RuntimeError("bgzf_decompress_block failed")
    return out.raw[:n]


def compress_buffer(data: bytes, level: int = 6):
    """Compress a whole buffer into BGZF blocks; returns (bytes, sizes)."""
    nblocks = max(1, -(-len(data) // 0xFF00))
    out = ctypes.create_string_buffer(nblocks * 65536)
    sizes = (ctypes.c_int * nblocks)()
    n = _lib.bgzf_compress_buffer(data, len(data), out, sizes, level)
    if n < 0:
        raise RuntimeError("bgzf_compress_buffer failed")
    return out.raw[:n], np.frombuffer(sizes, np.int32, nblocks).copy()
