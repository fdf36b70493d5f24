"""On-demand build of the native shared libraries.

The .so files are build artifacts (gitignored), so a fresh checkout has
none: without this, bench.py would silently fall back to the numpy CPU
baseline (inflating vs_baseline) and BGZF writes would lose the threaded
compressor.  One `make` invocation per process, best-effort — the loader
still raises OSError if the toolchain is absent, and every caller already
degrades gracefully on that.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.realpath(__file__))
_tried = False


def ensure_built(lib_path: str) -> None:
    """Run `make` in this directory once per process if lib_path is
    missing; quiet no-op when the library exists or make is unavailable."""
    global _tried
    if os.path.exists(lib_path) or _tried:
        return
    _tried = True
    try:
        subprocess.run(["make", "-C", _DIR], check=False,
                       stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
                       timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        pass
