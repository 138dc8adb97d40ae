"""Worker process for the real multi-process distributed test
(test_parallel.py::test_two_process_distributed). Run as:

    python tests/_dist_worker.py <coordinator_addr> <num_procs> <proc_id>

Must be launched with JAX_PLATFORMS=cpu and
XLA_FLAGS=--xla_force_host_platform_device_count=2 in the environment
(set BEFORE interpreter start; sitecustomize imports jax eagerly).
"""
import sys

import numpy as np


def main(addr: str, nprocs: int, pid: int) -> None:
    import jax
    jax.config.update("jax_platforms", "cpu")

    from svtpu.parallel.distributed import initialize, local_batch_to_global

    ok = initialize(coordinator_address=addr, num_processes=nprocs,
                    process_id=pid)
    assert ok, "initialize() returned False under explicit coordinator args"
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())
    n_local = len(jax.local_devices())
    assert n_global == nprocs * n_local, (n_global, n_local)

    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(-1), ("data",))

    # Per-process local shard -> one globally sharded array.
    local = np.full((2, 4), float(pid + 1), np.float32)
    g = local_batch_to_global(local, mesh, "data")
    assert g.shape == (nprocs * 2, 4), g.shape

    # One psum over the data axis across processes.
    f = jax.jit(jax.shard_map(
        lambda x: jax.lax.psum(x.sum(), "data"),
        mesh=mesh, in_specs=P("data"), out_specs=P()))
    total = float(np.asarray(f(g).addressable_data(0)))
    expected = sum(8.0 * (k + 1) for k in range(nprocs))
    assert total == expected, (total, expected)
    print(f"WORKER_OK {pid} total={total}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
