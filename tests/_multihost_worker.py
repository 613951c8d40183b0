"""Worker for the 2-process jax.distributed smoke test.

Launched by tests/test_multihost.py as
``python tests/_multihost_worker.py <coordinator> <num_procs> <proc_id>``.
Each process brings 2 local CPU devices, so the global mesh is 2 hosts x
2 devices = 4. Exercises the full multihost surface the single-process
suite cannot: initialize, split_between_processes, barrier,
broadcast_from_host0, and one pjit reduction over a cross-host mesh.

reference analogues: Accelerate process-group setup (model/trainer.py:63-68)
and split_between_processes (eval/eval_infer_batch.py:187).
"""
import sys

import jax

# The axon plugin overrides JAX_PLATFORMS; only jax.config works (conftest
# does the same). Must run before any other jax use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)

import numpy as np  # noqa: E402

from f5e_tts_tpu.parallel import multihost  # noqa: E402


def main() -> None:
    coord, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    multihost.initialize(coordinator_address=coord, num_processes=num_procs,
                         process_id=proc_id)
    assert jax.process_count() == num_procs, jax.process_count()
    assert jax.process_index() == proc_id, jax.process_index()
    assert len(jax.devices()) == 2 * num_procs, jax.devices()
    assert len(jax.local_devices()) == 2

    # contiguous per-process split (Accelerate semantics)
    items = list(range(7))
    mine = multihost.split_between_processes(items)
    assert mine == ([0, 1, 2, 3] if proc_id == 0 else [4, 5, 6]), mine
    padded = multihost.split_between_processes(items, pad=True)
    assert len(padded) == 4, padded
    if proc_id == 1:
        assert padded == [4, 5, 6, 6], padded

    multihost.barrier("smoke")

    # host0 decides, everyone agrees
    seed = np.asarray([1234 + proc_id], np.int32)
    agreed = multihost.broadcast_from_host0(seed)
    assert agreed.tolist() == [1234], agreed

    # one pjit step over the 2-host global mesh: per-process local shards
    # assembled into a global array, reduced to a replicated scalar
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()).reshape(2 * num_procs), ("data",))
    local = np.full((2, 8), proc_id + 1, np.float32)  # 2 rows per process
    garr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data", None)), local, (2 * num_procs, 8))

    @jax.jit
    def total(x):
        return jax.numpy.sum(x)

    out = total(garr)
    # fully-addressable output (replicated sum): 2*8*1 + 2*8*2 = 48
    expect = 8.0 * (1 + 1 + 2 + 2)
    got = float(np.asarray(jax.device_get(out)))
    assert got == expect, (got, expect)

    multihost.barrier("done")
    print(f"MULTIHOST_OK proc={proc_id} total={got}")


if __name__ == "__main__":
    main()
