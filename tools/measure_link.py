#!/usr/bin/env python
"""Measure the host<->device link: per-call latency, bandwidth vs transfer
size, and whether multiple queued async d2h copies pipeline or serialize.

Decides the RLE transfer sizing policy (one big pow2 slice vs many exact
pieces): if per-call overhead is high, fewer larger transfers win even
when they over-read.

Every rep reads a FRESH device array (a dynamic-slice at a different
offset of one big buffer, one cached program) — jax caches the host copy
of an array after its first np.asarray, so re-reading the same array
measures nothing.

Usage: python tools/measure_link.py
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import panagram_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from functools import partial

    dev = jax.devices()[0]
    print(f"device={dev}", flush=True)

    BIG = 64 << 20
    base = jax.device_put(jnp.zeros(BIG, jnp.uint8), dev)
    base.block_until_ready()

    @partial(jax.jit, static_argnums=(2,))
    def sl(arr, start, n):
        return jax.lax.dynamic_slice(arr, (start,), (n,))

    # d2h sync: one transfer per size, 3 reps on fresh slices
    for mb in (0.25, 1, 4, 16):
        n = int(mb * (1 << 20))
        ts = []
        for r in range(3):
            arr = sl(base, jnp.int32(r * n % (BIG - n)), n)
            arr.block_until_ready()
            t0 = time.perf_counter()
            np.asarray(arr)
            ts.append(time.perf_counter() - t0)
        print(f"d2h {mb:7.2f} MB sync : best {min(ts)*1e3:7.1f} ms "
              f"({mb/min(ts):6.1f} MB/s)  all "
              f"{[round(t*1e3) for t in ts]}", flush=True)

    # d2h: 4 MB split into N async-queued pieces, drained together
    total = 4 << 20
    for npieces in (1, 4, 16):
        n = total // npieces
        ts = []
        for r in range(3):
            arrs = [sl(base, jnp.int32((r * 16 + i) * n % (BIG - n)), n)
                    for i in range(npieces)]
            for a in arrs:
                a.block_until_ready()
            t0 = time.perf_counter()
            for a in arrs:
                try:
                    a.copy_to_host_async()
                except Exception:
                    pass
            for a in arrs:
                np.asarray(a)
            ts.append(time.perf_counter() - t0)
        print(f"d2h 4 MB in {npieces:3d} async pieces: best "
              f"{min(ts)*1e3:7.1f} ms ({4/min(ts):6.1f} MB/s)  all "
              f"{[round(t*1e3) for t in ts]}", flush=True)

    # async copy issued, then overlapped host work, then drain: how much
    # of the transfer hides behind 200 ms of host compute?
    n = 4 << 20
    ts = []
    for r in range(3):
        arr = sl(base, jnp.int32(r * n), n)
        arr.block_until_ready()
        t0 = time.perf_counter()
        try:
            arr.copy_to_host_async()
        except Exception:
            pass
        x = 0.0
        while time.perf_counter() - t0 < 0.2:
            x += float(np.random.rand(1 << 14).sum())
        t1 = time.perf_counter()
        np.asarray(arr)
        ts.append(time.perf_counter() - t1)
    print(f"d2h 4 MB drain after 200 ms overlap: best {min(ts)*1e3:7.1f} ms"
          f"  all {[round(t*1e3) for t in ts]}", flush=True)

    # h2d for completeness (device_put of fresh host buffers)
    for mb in (1, 16):
        n = int(mb * (1 << 20))
        ts = []
        for r in range(3):
            host = np.full(n, r, np.uint8)
            t0 = time.perf_counter()
            jax.device_put(host, dev).block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"h2d {mb:7.2f} MB      : best {min(ts)*1e3:7.1f} ms "
              f"({mb/min(ts):6.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
