"""Worker process for the 2-host jax.distributed CPU test.

Launched by tests/test_multihost_2proc.py as two real OS processes so the
cross-host contracts (gather_objects, all_hosts_agree_ok, oom_resilient_step,
shard_for_host + jsonl merge) actually cross a process boundary — they
degrade to identity on one host, which is what every other test exercises.

Usage: python multihost_worker.py <coordinator> <num_procs> <pid> <workdir>
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_PLATFORM_NAME", "cpu")


def main():
    coord, n_procs, pid, workdir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    import jax

    # the axon sitecustomize registers its TPU plugin and pins jax_platforms
    # at interpreter startup — the env vars above are not enough (same trick
    # as tests/conftest.py); without this the worker attaches to the tunnel
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_platform_name", "cpu")

    jax.distributed.initialize(
        coordinator_address=coord, num_processes=n_procs, process_id=pid)
    assert jax.process_count() == n_procs, jax.process_count()
    assert jax.process_index() == pid

    from glimpseprune_tpu.evalsuite.data import shard_for_host
    from glimpseprune_tpu.utils.failures import (
        all_hosts_agree_ok,
        oom_resilient_step,
    )
    from glimpseprune_tpu.utils.multihost import (
        gather_objects,
        merge_host_results,
    )

    # 1. gather_objects: JSON payloads of different sizes, host order
    got = gather_objects({"host": pid, "payload": "x" * (10 + 100 * pid)})
    assert [g["host"] for g in got] == list(range(n_procs)), got
    assert len(got[1]["payload"]) == 110

    # 2. all-success step: every host proceeds
    assert all_hosts_agree_ok(True) is True

    # 3. host 1 OOMs -> EVERY host skips in sync (warppers.py:443-494)
    @oom_resilient_step(skip_value="skipped")
    def step():
        if pid == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: fake step OOM")
        return "ran"

    assert step() == "skipped"

    # 4. a non-OOM failure on one host must NOT be swallowed there
    if pid == 1:
        @oom_resilient_step(skip_value=None)
        def bad():
            raise ValueError("not an oom")

        try:
            bad()
            raise AssertionError("ValueError should propagate")
        except ValueError:
            pass
    # ...while the healthy host reports ok; agreement sees the failed
    # host's later False (the failed host still must vote)
    ok_here = pid != 1
    assert all_hosts_agree_ok(ok_here) is False

    # 5. eval sharding + merge: each host scores its contiguous shard,
    # writes a jsonl, host 0 merges after a gather barrier
    samples = [{"question_id": f"q{i}", "answer": i} for i in range(7)]
    mine = shard_for_host(samples, pid, n_procs)
    assert len(mine) == (4 if pid == 0 else 3)
    shard_path = os.path.join(workdir, f"shard_{pid}.jsonl")
    with open(shard_path, "w") as f:
        for rec in mine:
            f.write(json.dumps(rec) + "\n")
    paths = gather_objects(shard_path)  # barrier: both shards on disk
    if pid == 0:
        merged = os.path.join(workdir, "merged.jsonl")
        n = merge_host_results(paths, merged)
        assert n == 7, n
        ids = [json.loads(l)["question_id"] for l in open(merged)]
        assert ids == [f"q{i}" for i in range(7)], ids

    print(f"WORKER_OK {pid}", flush=True)


if __name__ == "__main__":
    main()
