#!/usr/bin/env python
"""Tiny Mosaic capability probes for the fused pack+mix kernel design:
exact u32 multiply, roll on 1D u32, minor-axis stack store, u32 compares.
Run on the TPU tunnel ONLY while nothing else touches it."""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
_plat = os.environ.get("JAX_PLATFORMS", "")
if _plat and "cpu" not in _plat:
    os.environ["JAX_PLATFORMS"] = _plat + ",cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import panagram_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"devices={jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    n = 1024
    a = rng.integers(0, 1 << 32, n, dtype=np.uint32)
    b = rng.integers(0, 1 << 32, n, dtype=np.uint32)

    R = n // 128

    def kern(a_ref, b_ref, o_ref):
        x = a_ref[:]                               # [R, 128] u32
        y = b_ref[:]
        prod = x * y                               # u32 mul (mod 2^32?)
        # element shift by 1 over row-major [R, 128]: lane roll + column
        # splice (last lane takes the next row's lane 0)
        lr = pltpu.roll(x, 127, axis=1)            # [r,l] <- x[r, l+1]
        z = pltpu.roll(lr, R - 1, axis=0)          # [r,l] <- x[r+1, l+1]
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
        rolled = jnp.where(lane == 127, z, lr)
        hi16 = (x >> jnp.uint32(16)) * (y & jnp.uint32(0xFFFF))
        cmp = jnp.where(x < y, prod, rolled)
        o_ref[:] = jnp.stack([prod, rolled, hi16, cmp], axis=2)

    with jax.enable_x64(False):
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((n // 128, 128, 4), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(jnp.asarray(a.reshape(-1, 128)), jnp.asarray(b.reshape(-1, 128)))
    out = np.asarray(out).reshape(n, 4)
    want_prod = (a.astype(np.uint64) * b.astype(np.uint64)).astype(np.uint32)
    want_roll = np.roll(a, -1)
    want_hi16 = ((a >> 16).astype(np.uint64) * (b & 0xFFFF)).astype(np.uint32)
    want_cmp = np.where(a < b, want_prod, want_roll)
    print("u32 mul exact:", np.array_equal(out[:, 0], want_prod))
    print("roll ok:      ", np.array_equal(out[:, 1], want_roll))
    print("16x32 mul ok: ", np.array_equal(out[:, 2], want_hi16))
    print("select ok:    ", np.array_equal(out[:, 3], want_cmp))


if __name__ == "__main__":
    main()
