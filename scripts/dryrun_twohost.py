#!/usr/bin/env python
"""Simulated 2-host dry run: the sharded mapping step over a 2-process
jax.distributed CPU backend (Gloo collectives = the DCN stand-in).

Mesh layout: (data=4, idx=2) over 8 global devices, 4 per process --
data parallelism crosses the host boundary, the index all_gather stays
inside a host (BASELINE.md rule: no cross-host collectives on the hot
path except the final psum of read stats).

Checks: one sharded step runs to completion across both processes and
its merged output is equivalent to the single-device step.

Usage:  python scripts/dryrun_twohost.py          # spawns both workers
        python scripts/dryrun_twohost.py --worker I PORT   # internal
"""
from __future__ import annotations

import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def worker(pid: int, port: int) -> None:
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=4")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=pid)
    assert jax.device_count() == 8 and jax.local_device_count() == 4
    import numpy as np
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    import __graft_entry__ as g
    from jax.experimental import multihost_utils
    from minimap2_tpu.parallel.batch import (DeviceIndex, make_sharded_step,
                                             map_batch, stack_shards)

    # deterministic world: both processes build identical host data
    mi, p, codes, lens = g._build_tiny(B=8, seed=13, skew=True)
    codes, lens = np.asarray(codes), np.asarray(lens)
    # rows 0-1 (devices 0-3) = host 0; rows 2-3 (devices 4-7) = host 1
    devs = np.array(jax.devices()).reshape(4, 2)
    mesh = Mesh(devs, ("data", "idx"))
    di = stack_shards(DeviceIndex.from_host(mi, 2))
    step = make_sharded_step(mesh, p, interpret=True, **di.aux_dict())

    def to_global(x, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            np.asarray(x).shape, sh, lambda idx: np.asarray(x)[idx])

    di_g = jax.tree_util.tree_map(
        lambda x: to_global(x, P("idx")) if x is not None else None, di,
        is_leaf=lambda x: x is None)
    codes_g = to_global(codes, P("data", None))
    lens_g = to_global(lens, P("data"))
    with mesh:
        out, n_mapped, n_anc = step(di_g, codes_g, lens_g)
    out_full = {k: multihost_utils.process_allgather(v, tiled=True)
                for k, v in out.items()}
    n_anc_full = multihost_utils.process_allgather(n_anc, tiled=True)

    # single-device reference on this process's first local device
    di1 = DeviceIndex.from_host(mi, 1)[0]
    ref = map_batch(di1, codes, lens, p, interpret=True)
    for fld in ("rs", "re", "rev", "rid", "chain_score"):
        got, want = np.asarray(out_full[fld]), np.asarray(ref[fld])
        assert np.array_equal(got, want), \
            f"proc {pid}: twohost merge mismatch in {fld}: {got} vs {want}"
    if pid == 0:
        per_idx = np.asarray(n_anc_full).reshape(4, 2).sum(axis=0)
        print(f"[twohost] n_proc=2 mesh=(data=4,idx=2) n_mapped="
              f"{int(n_mapped)} per-idx anchors={per_idx.tolist()} "
              "twohost-equivalence=ok", flush=True)


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]))
        return 0
    import socket
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--worker", str(i),
         str(port)], env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, cwd=ROOT) for i in range(2)]
    ok = True
    for i, pr in enumerate(procs):
        out, _ = pr.communicate(timeout=600)
        if pr.returncode != 0:
            ok = False
            print(f"--- worker {i} rc={pr.returncode}\n{out[-2000:]}")
        else:
            for line in out.splitlines():
                if line.startswith("[twohost]"):
                    print(line)
    print("twohost dryrun:", "OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
