"""Multi-HOST collective build: two processes x 4 virtual CPU devices
joined into ONE 8-device global mesh via jax.distributed (SURVEY §5.8 /
§2.7 P8: dictionaries merged and reductions crossing hosts through the
same shard_map collectives the single-process mesh uses — on CPU they ride
the Gloo backend, on a real slice ICI/DCN).

The single-process 8-device mesh build is already proven byte-identical to
the plain build (tests/test_parallel.py), so asserting the 2-process mesh
build against the PLAIN build closes the chain end-to-end."""

import os
import socket
import subprocess
import sys

from panagram_tpu.io.bgzf import decompress_file
from tests.conftest import random_seq

K = 13


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _subproc_env() -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # each process contributes 4 local virtual devices -> 8 global
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    return env


def test_two_process_mesh_build_matches_single(rng, tmp_path):
    fa_dir = tmp_path / "fa"
    fa_dir.mkdir()
    names = ["g1", "g2", "g3", "g4"]
    for n in names:
        seq = random_seq(rng, 2000, n_frac=0.005)
        (fa_dir / f"{n}.fa").write_text(f">chr1\n{seq}\n")
    samples = tmp_path / "samples.tsv"
    samples.write_text("name\tfasta\n" + "\n".join(
        f"{n}\t{fa_dir}/{n}.fa" for n in names) + "\n")

    env = _subproc_env()

    # plain single-process reference build
    ref_dir = tmp_path / "single"
    subprocess.check_call(
        [sys.executable, "-m", "panagram_tpu", "index", str(samples),
         "-o", str(ref_dir), "-k", str(K)], env=env)

    # 2-process x 4-device global-mesh collective build
    mesh_dir = tmp_path / "mesh2p"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "panagram_tpu", "index", str(samples),
             "-o", str(mesh_dir), "-k", str(K), "--mesh", "8",
             "--num-processes", "2", "--process-id", str(pid),
             "--coordinator", f"127.0.0.1:{port}"],
            env=env)
        for pid in (0, 1)
    ]
    rcs = [p.wait(timeout=900) for p in procs]
    assert rcs == [0, 0]

    mirror = tmp_path / "mesh2p.p1"   # process 1's write mirror
    for n in names:
        want = decompress_file(str(ref_dir / "anchor" / n / "bitmap.1.gz"))
        got = decompress_file(str(mesh_dir / "anchor" / n / "bitmap.1.gz"))
        assert got == want
        # every host decoded the same collective outputs
        got1 = decompress_file(str(mirror / "anchor" / n / "bitmap.1.gz"))
        assert got1 == want
        assert ((ref_dir / "anchor" / n / "total_paircounts.csv").read_text()
                == (mesh_dir / "anchor" / n / "total_paircounts.csv")
                .read_text())
    assert (mesh_dir / "genome_dist.tsv").exists()


def test_mesh_num_processes_requires_coordinator(tmp_path):
    from panagram_tpu.__main__ import main

    samples = tmp_path / "samples.tsv"
    samples.write_text("name\tfasta\n")
    try:
        main(["index", str(samples), "-o", str(tmp_path / "x"),
              "--mesh", "8", "--num-processes", "2"])
    except SystemExit as e:
        assert "coordinator" in str(e)
    else:
        raise AssertionError("expected SystemExit")
