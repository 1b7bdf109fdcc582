"""Two-process ``jax.distributed`` smoke (VERDICT r2 item 7).

The multi-host story elsewhere in the suite is exercised single-process
(explicit process_index args; virtual 8-device CPU mesh). This test crosses
REAL process boundaries: it spawns two worker processes, initializes the
distributed runtime against a local coordinator, runs the sharded input
pipeline with runtime-resolved process indices, and executes one
data-parallel train step whose gradient all-reduce spans both processes.

Asserts:
- both workers see 2 local / 4 global devices (2 procs × 2 CPU devices),
- the training volume corpus is partitioned (disjoint shards, equal
  steps-per-epoch),
- both processes compute the SAME loss for the one global step (the SPMD
  program is consistent and the collectives actually ran).

Opt out with TPUREG_SKIP_DISTRIBUTED=1 (e.g. on hosts where spawning
listeners is blocked).
"""

import os
import re
import socket
import struct
import subprocess
import sys

import numpy as np
import pytest

from test_data import write_analyze

pytestmark = pytest.mark.skipif(
    os.environ.get("TPUREG_SKIP_DISTRIBUTED") == "1",
    reason="distributed smoke disabled by env",
)


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_step(tmp_path):
    rng = np.random.default_rng(0)
    img_dir, seg_dir = tmp_path / "img", tmp_path / "seg"
    img_dir.mkdir(), seg_dir.mkdir()
    for i in range(6):
        vol = (rng.random((176, 208, 176, 1)) * 1000).astype(np.int16)
        seg = rng.integers(0, 4, (176, 208, 176, 1)).astype(np.int16)
        write_analyze(str(img_dir / f"sub{i:02d}_mpr"), vol)
        write_analyze(str(seg_dir / f"sub{i:02d}_seg"), seg)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "").strip()
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(i), "2",
             str(img_dir), str(seg_dir)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    def field(out, pat):
        m = re.search(pat, out)
        assert m, f"missing {pat!r} in:\n{out[-2000:]}"
        return m.group(1)

    for out in outs:
        assert field(out, r"local_devices=(\d+)") == "2"
        assert field(out, r"global_devices=(\d+)") == "4"

    # disjoint volume shards, equal steps-per-epoch
    v0 = field(outs[0], r"vols=(\[.*?\])")
    v1 = field(outs[1], r"vols=(\[.*?\])")
    assert v0 != v1
    assert not (set(eval(v0)) & set(eval(v1)))
    assert field(outs[0], r"train_len=(\d+)") == field(
        outs[1], r"train_len=(\d+)")

    # one global step, identical (replicated) loss on both processes
    l0 = float(field(outs[0], r"loss=([0-9.eE+-]+)"))
    l1 = float(field(outs[1], r"loss=([0-9.eE+-]+)"))
    assert l0 == l1
