#!/usr/bin/env python
"""Measure the host<->device link: per-call latency, bandwidth vs transfer
size, and whether multiple queued async d2h copies pipeline or serialize.

Decides the RLE transfer sizing policy (one big pow2 slice vs many exact
pieces): if per-call overhead is high, fewer larger transfers win even
when they over-read.

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

    dev = jax.devices()[0]
    print(f"device={dev}", flush=True)

    @jax.jit
    def make(n):
        return jnp.arange(n, dtype=jnp.uint8) * jnp.uint8(3)

    # d2h: one sync transfer per size, 3 reps, report best + worst
    for mb in (0.0625, 0.25, 1, 4, 16):
        n = int(mb * (1 << 20))
        arr = jax.device_put(jnp.zeros(n, jnp.uint8), dev) + jnp.uint8(1)
        arr.block_until_ready()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(arr)
            ts.append(time.perf_counter() - t0)
        print(f"d2h {mb:7.4f} MB sync : best {min(ts)*1e3:7.1f} ms "
              f"({mb/min(ts):6.1f} MB/s)  worst {max(ts)*1e3:7.1f} ms",
              flush=True)

    # d2h: N async copies of one 4 MB buffer split into N pieces, drained
    # together — pipelining test
    total = 4 << 20
    for npieces in (1, 4, 16):
        n = total // npieces
        arrs = [jax.device_put(jnp.zeros(n, jnp.uint8), dev) + jnp.uint8(i)
                for i in range(npieces)]
        for a in arrs:
            a.block_until_ready()
        ts = []
        for _ in range(3):
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
              f"{min(ts)*1e3:7.1f} ms ({4/min(ts):6.1f} MB/s)  "
              f"worst {max(ts)*1e3:7.1f} ms", flush=True)

    # h2d for completeness
    for mb in (1, 16):
        n = int(mb * (1 << 20))
        host = np.zeros(n, np.uint8)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_put(host, dev).block_until_ready()
            ts.append(time.perf_counter() - t0)
        print(f"h2d {mb:7.4f} MB      : best {min(ts)*1e3:7.1f} ms "
              f"({mb/min(ts):6.1f} MB/s)", flush=True)


if __name__ == "__main__":
    main()
