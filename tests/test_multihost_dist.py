"""Real 2-process multi-host rendezvous over jax.distributed on CPU:
parallel/dist.py's initialize + pickled all_gather + BN-stat sync +
gather-to-rank-0, the TPU-native replacement for the reference's
NCCL/gloo process groups (yolox/core/launch.py:101-147,
yolox/utils/dist.py:195-233, yolox/utils/allreduce_norm.py:97)."""

import json
import os
import socket
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, %(repo)r)
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); port = sys.argv[2]
    import numpy as np
    from tscd_tpu.parallel.dist import (initialize, all_gather_objects,
                                        gather_objects, get_rank,
                                        get_world_size, sync_batch_stats)
    initialize("localhost:" + port, 2, pid)
    assert get_world_size() == 2 and get_rank() == pid
    objs = all_gather_objects({"rank": pid, "dets": [pid] * (pid + 1)})
    synced = sync_batch_stats(
        {"bn": {"mean": np.full(4, float(pid), np.float32)}})
    g = gather_objects(("x", pid), dst=0)
    print(json.dumps({"pid": pid, "objs": objs,
                      "synced": float(synced["bn"]["mean"][0]),
                      "n_gathered": len(g)}))
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_rendezvous_and_collectives(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER % {"repo": REPO})
    port = str(_free_port())
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(pid), port],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    # pickled all_gather returns every process's object in rank order
    for o in outs:
        assert o["objs"] == [{"rank": 0, "dets": [0]},
                             {"rank": 1, "dets": [1, 1]}]
        # BN stats averaged across processes: (0 + 1) / 2
        assert o["synced"] == 0.5
    # gather keeps the result only on dst
    assert by_pid[0]["n_gathered"] == 2
    assert by_pid[1]["n_gathered"] == 0
