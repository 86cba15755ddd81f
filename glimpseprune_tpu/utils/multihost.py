"""Multi-host helpers: object/metric gather over hosts.

TPU-native replacement for the reference's torch.distributed
`all_gather_object` reassembly (viscot_eval/infer_cot.py:376-391): JSON-able
per-host results gather over jax.experimental.multihost_utils; degrades to a
no-op on a single host so harness code is topology-agnostic.
"""

from __future__ import annotations

import json
from typing import Any, List

import numpy as np


def num_hosts() -> int:
    import jax

    return jax.process_count()


def host_id() -> int:
    import jax

    return jax.process_index()


def gather_objects(obj: Any, max_bytes: int = 1 << 22) -> List[Any]:
    """All-gather one JSON-able object per host; returns the list (host order).

    Objects serialize to fixed-width uint8 buffers (max_bytes each) and ride
    a process_allgather; single-host returns [obj] without touching devices.
    """
    import jax

    if jax.process_count() == 1:
        return [obj]

    from jax.experimental import multihost_utils

    payload = json.dumps(obj).encode()
    if len(payload) > max_bytes - 8:
        raise ValueError(f"object too large to gather ({len(payload)} bytes)")
    buf = np.zeros(max_bytes, dtype=np.uint8)
    buf[:8] = np.frombuffer(np.int64(len(payload)).tobytes(), dtype=np.uint8)
    buf[8 : 8 + len(payload)] = np.frombuffer(payload, dtype=np.uint8)
    gathered = multihost_utils.process_allgather(buf)  # [n_hosts, max_bytes]
    out = []
    for row in np.asarray(gathered):
        n = int(np.frombuffer(row[:8].tobytes(), dtype=np.int64)[0])
        out.append(json.loads(row[8 : 8 + n].tobytes().decode()))
    return out


def merge_host_results(jsonl_paths: List[str], out_path: str) -> int:
    """Concatenate per-host shard jsonls (tools/infer_viscot.py --num-hosts
    output) into one file, de-duplicated by question_id, stable order."""
    seen = set()
    n = 0
    with open(out_path, "w") as out:
        for p in jsonl_paths:
            with open(p) as f:
                for line in f:
                    rec = json.loads(line)
                    qid = rec.get("question_id")
                    if qid in seen:
                        continue
                    seen.add(qid)
                    out.write(line if line.endswith("\n") else line + "\n")
                    n += 1
    return n
