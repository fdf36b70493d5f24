"""Benchmark: anchoring throughput (the north-star hot loop).

Measures the streamed anchor pipeline — canonical k-mer packing +
dictionary gather + popcount + byte-pack — on the available accelerator,
and compares against the CPU reference implementation (the same
computation via numpy, standing in for the reference's KMC +
cpp/run_anchor path, which is not runnable in this image: the KMC
binaries are not shipped in the reference snapshot).

Prints ONE JSON line:
  {"metric": "anchor_kmers_per_s", "value": N, "unit": "kmers/s",
   "vs_baseline": N / cpu_reference_kmers_per_s}
"""

import json
import sys
import time

import numpy as np


def main():
    quick = "--quick" in sys.argv

    import panagram_tpu  # noqa: F401  (x64 on)
    import jax
    import jax.numpy as jnp

    from panagram_tpu.ops.anchor import anchor_chunk, masks_to_bytes
    from panagram_tpu.ops.codec import MAX_K
    from panagram_tpu.ops.count import distinct_kmers_chunked
    from panagram_tpu.ops.dictionary import build_dictionary

    k = 21
    ngenomes = 30
    seq_len = 1 << (20 if quick else 23)   # 8M bp anchor sequence
    dict_genome_len = 1 << (18 if quick else 21)
    chunk = 1 << (18 if quick else 21)

    rng = np.random.default_rng(0)

    # build a realistic dictionary: 30 related genomes
    base = rng.integers(0, 4, dict_genome_len, dtype=np.uint8)
    sets = []
    for g in range(ngenomes):
        mut = base.copy()
        n_mut = dict_genome_len // 100
        pos = rng.choice(dict_genome_len, n_mut, replace=False)
        mut[pos] = rng.integers(0, 4, n_mut, dtype=np.uint8)
        sets.append(distinct_kmers_chunked([mut], k))
    d = build_dictionary(sets, k, ngenomes=ngenomes)

    # anchor sequence = mutated base tiled to seq_len
    reps = -(-seq_len // dict_genome_len)
    anchor_codes = np.tile(base, reps)[:seq_len]

    keys_d = jnp.asarray(d.keys)
    masks_d = jnp.asarray(d.masks)

    buf = np.empty(chunk + k - 1, np.uint8)

    def run_once():
        total = 0
        nk = seq_len - k + 1
        for start in range(0, nk, chunk):
            m = min(chunk, nk - start)
            buf[:] = 255
            buf[: m + k - 1] = anchor_codes[start : start + m + k - 1]
            rows, popc = anchor_chunk(jnp.asarray(buf), keys_d, masks_d, k)
            by = masks_to_bytes(rows)
            jax.block_until_ready((by, popc))
            total += m
        return total

    run_once()  # compile + warm
    t0 = time.perf_counter()
    total = run_once()
    dt = time.perf_counter() - t0
    device_rate = total / dt

    # CPU reference baseline on a sample (same computation in numpy)
    from panagram_tpu.ops.ref_impl import (
        anchor_np,
        masks_to_bytes_np,
        popcount_np,
    )

    sample = 1 << 19 if not quick else 1 << 16
    seq = "".join("ACGT"[c] for c in anchor_codes[: sample + k - 1])
    t0 = time.perf_counter()
    rows = anchor_np(seq, k, d.keys, d.masks)
    _ = masks_to_bytes_np(rows, d.nbytes_row)
    _ = popcount_np(rows)
    cpu_dt = time.perf_counter() - t0
    cpu_rate = sample / cpu_dt

    print(json.dumps({
        "metric": "anchor_kmers_per_s",
        "value": round(device_rate),
        "unit": "kmers/s",
        "vs_baseline": round(device_rate / cpu_rate, 3),
    }))


if __name__ == "__main__":
    main()
