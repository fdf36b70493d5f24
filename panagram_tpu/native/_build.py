"""On-demand build of the native shared libraries.

The .so files are build artifacts (gitignored), so a fresh checkout has
none: without this, bench.py would silently fall back to the numpy CPU
baseline (inflating vs_baseline) and BGZF writes would lose the threaded
compressor.  One `make` invocation per process, best-effort — the loader
still raises OSError if the toolchain is absent, and every caller already
degrades gracefully on that.

Concurrency: multiple first imports (the multi-process build driver,
parallel pytest) may race here, and a process must never dlopen a
half-written .so — the make invocation is serialised through an fcntl
lockfile and the target is re-checked after the lock drops.
"""

from __future__ import annotations

import os
import subprocess
import sys

_DIR = os.path.dirname(os.path.realpath(__file__))
_tried: set = set()


def _run_make(target: str, force: bool = False) -> None:
    """Build one target under an exclusive lockfile; warn on failure
    instead of silently degrading to the pure-Python fallback."""
    lock_path = os.path.join(_DIR, ".build.lock")
    with open(lock_path, "w") as lock:
        try:
            import fcntl

            fcntl.flock(lock, fcntl.LOCK_EX)
        except (ImportError, OSError):
            pass
        if not force and not _stale(os.path.join(_DIR, target)):
            return  # another process built it while we waited
        cmd = ["make", "-B", "-C", _DIR, target] if force else \
            ["make", "-C", _DIR, target]
        result = subprocess.run(
            cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            timeout=120)
        if result.returncode != 0:
            tail = result.stdout.decode("utf-8", "replace").strip()
            tail = tail[-500:] if tail else "(no output)"
            print(f"panagram_tpu: make {target} failed "
                  f"(rc={result.returncode}); falling back to pure "
                  f"Python.\n{tail}", file=sys.stderr)


def rebuild(lib_path: str) -> None:
    """Force-rebuild a library (stale prebuilt artifact missing a newer
    symbol — the .so files are gitignored, so checkouts carry old ones
    across commits).  Best-effort like ensure_built."""
    target = os.path.basename(lib_path)
    _tried.add(target)
    try:
        _run_make(target, force=True)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"panagram_tpu: could not rebuild {target} ({e}).",
              file=sys.stderr)


def _stale(lib_path: str) -> bool:
    """True when any source file in the directory is newer than the
    library — the .so files are gitignored, so a checkout can carry a
    prebuilt artifact across source edits (a real failure mode: round 3
    hit a stale .so missing a new symbol)."""
    try:
        lib_mtime = os.path.getmtime(lib_path)
    except OSError:
        return True
    for name in os.listdir(_DIR):
        if name.endswith((".cpp", ".h", ".c")) or name == "Makefile":
            try:
                if os.path.getmtime(os.path.join(_DIR, name)) > lib_mtime:
                    return True
            except OSError:
                pass
    return False


def ensure_built(lib_path: str) -> None:
    """Build lib_path's make target once per process if the library is
    missing or older than the sources; quiet no-op when it is current or
    the toolchain is absent.  Builds only the requested target so one
    broken target (e.g. missing zlib headers) cannot block an independent
    one."""
    target = os.path.basename(lib_path)
    if target in _tried or (os.path.exists(lib_path)
                            and not _stale(lib_path)):
        return
    _tried.add(target)
    try:
        _run_make(target)
    except (OSError, subprocess.TimeoutExpired) as e:
        print(f"panagram_tpu: could not build {target} ({e}); "
              "falling back to pure Python.", file=sys.stderr)
