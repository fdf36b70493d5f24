"""Device mesh helpers.

The engine's distribution model (SURVEY §2.7, §5.8):

* one logical mesh axis, ``shard``, over which BOTH the dictionary (by key
  range — the tensor-parallel analogue of the reference's <=32-genome
  bit-plane partitioning, reference index.py:391-426) AND anchor-sequence
  positions (sequence parallelism — the chunk streaming of cpp/anchor.cpp
  :112-147) are sharded;
* queries are routed between the two shardings with an all_to_all by key
  range; totals/histograms come back via psum.

Multi-host runs initialize jax.distributed per host and use the same mesh
over the global device list.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DICT_AXIS = "shard"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # a silently truncated mesh produces WRONG results downstream
            # (callers decode outputs assuming n_devices shards) — fail
            # loudly instead; on CPU runs the 8-virtual-device env must be
            # in place before the interpreter starts (tests/conftest.py)
            raise ValueError(
                f"make_mesh: {n_devices} devices requested but only "
                f"{len(devices)} visible ({[str(d) for d in devices]}); "
                f"set XLA_FLAGS=--xla_force_host_platform_device_count="
                f"{n_devices} (before process start) or lower --mesh")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DICT_AXIS,))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
    """Multi-host bring-up (jax.distributed).

    Only runs when a coordinator address is explicitly given: the
    file-coordinated build DAG (parallel/distributed.py) does not need
    cross-process collectives, and jax.distributed must be initialized
    before any backend use, which a library cannot guarantee.

    After this, ``jax.devices()`` is the GLOBAL device list across all
    processes and ``make_mesh`` spans it — shard_map bodies and their
    collectives (all_to_all / psum) are unchanged; on TPU slices they ride
    ICI/DCN, on the CPU test fixture they ride the Gloo backend."""
    if not coordinator or num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def sharded_writes_enabled() -> bool:
    """True when a multi-process mesh build should use the per-host
    sharded drain + piece writes (each process expands and BGZF-writes
    only its own devices' bitmap rows; the primary stitches).  Default
    for any multi-process run; PANAGRAM_TPU_SHARD_WRITES=0 restores the
    every-process-writes-everything mirror behaviour."""
    import os

    if os.environ.get("PANAGRAM_TPU_SHARD_WRITES", "1") == "0":
        return False
    return jax.process_count() > 1


def assert_lockstep(tag: str, value):
    """Fail LOUDLY when `value` differs across the processes of a
    multi-process mesh build.

    Stage-skip decisions (mtime caching) gate collective work: if one
    process skips a stage another re-runs, their collective call
    sequences diverge and the job dies deep in the transport layer with
    an opaque size-mismatch ("op.preamble.length <= op.nbytes").  This
    turns that into an immediate, actionable error.  It is ITSELF a
    collective — call it unconditionally at the decision point on every
    process.  No-op in single-process runs."""
    if jax.process_count() <= 1:
        return
    import hashlib

    from jax.experimental import multihost_utils

    h = np.frombuffer(
        hashlib.sha256(repr(value).encode()).digest()[:8], np.uint64)
    all_h = np.asarray(
        multihost_utils.process_allgather(h, tiled=True)).reshape(-1)
    if not (all_h == all_h[0]).all():
        raise RuntimeError(
            f"multi-process build desync at '{tag}': processes disagree "
            f"on a cached-stage decision (value here: {value!r}).  All "
            "processes must start from equivalent stage states — use "
            "fresh/equalized output dirs or pass --force on every "
            "process.")


def host_view(x) -> np.ndarray:
    """``np.asarray`` that also works for global (multi-process) arrays.

    Sharded outputs of the mesh engines are only partially addressable
    when processes > 1; gather them with an all_gather collective so every
    process sees the full value (control decisions made from these values
    — overflow retries, prefix sizes — must match across processes or the
    collective programs deadlock, so a full gather is the SAFE primitive;
    per-host shard reads are a later optimization).  NOTE: in
    multi-process mode this is itself a collective — every process must
    call it in the same order."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)
