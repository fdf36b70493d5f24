#!/usr/bin/env python
"""Can two remote XLA compiles proceed concurrently on the axon tunnel?

Times two fresh (never-compiled-this-process) programs compiled serially
in one run vs concurrently in another (--concurrent).  If concurrent ~=
max(serial parts), a program-warmer thread pool can hide the per-process
compile wall behind the pipeline's other work (the compile cache does NOT
persist on this backend — /tmp/jax_cache stays empty).
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    conc = "--concurrent" in sys.argv
    import jax
    import jax.numpy as jnp

    import panagram_tpu  # noqa: F401

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.integers(0, 1 << 63, (1 << 21) + 160).astype(np.uint64))
    b = jnp.asarray(rng.integers(0, 1 << 31, (1 << 21) + 544).astype(np.uint32))
    jax.block_until_ready((a, b))

    # two distinct programs (odd sizes keep them out of any earlier session
    # state); each is a sort + arithmetic so the remote compile is real
    f1 = jax.jit(lambda x: jnp.sort(x ^ jnp.uint64(3)))
    f2 = jax.jit(lambda x: jnp.sort(x + jnp.uint32(7)))

    def run(f, x):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    if conc:
        with ThreadPoolExecutor(2) as ex:
            r1 = ex.submit(run, f1, a)
            r2 = ex.submit(run, f2, b)
            t1, t2 = r1.result(), r2.result()
    else:
        t1 = run(f1, a)
        t2 = run(f2, b)
    total = time.perf_counter() - t0
    mode = "concurrent" if conc else "serial"
    print(f"{mode}: prog1 {t1:.1f}s prog2 {t2:.1f}s total {total:.1f}s",
          flush=True)


if __name__ == "__main__":
    main()
