"""Worker for tests/test_multiprocess_prefetch.py — NOT a pytest module.

Runs as one process of a 2-process CPU `jax.distributed` job and replays
the trainer hot loop's batch path (`_numpy_batch` -> `device_prefetch` ->
jitted global reduction) to prove the global batch is assembled from every
host's DISTINCT rows (the local-as-global bug class from ADVICE r3).
"""

import os
import sys


def main():
    idx, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(f"localhost:{port}", num_processes=n,
                               process_id=idx)
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from videocad_tpu.data.pipeline import device_prefetch
    from videocad_tpu.parallel.mesh import create_mesh
    from videocad_tpu.train.trainer import _numpy_batch

    assert jax.process_count() == n
    mesh = create_mesh()  # data = 8 across both processes
    local_b, steps = 4, 2

    def host_batches():
        # Host-DISTINCT rows, some already jax arrays (the ADVICE r3
        # regression: pre-converted values must still route through
        # put_local_shard, not slip past as host-local device arrays).
        for step in range(steps):
            rows = (np.arange(local_b, dtype=np.float32)
                    + 100 * idx + 1000 * step)
            yield _numpy_batch({
                "frames": jnp.tile(rows[:, None], (1, 3)),
                "actions": np.tile(rows[:, None], (1, 7)),
                "ids": [f"h{idx}"] * local_b,  # non-arrays must be dropped
            })

    expected_global_rows = n * local_b
    seen = 0
    for step, batch in enumerate(device_prefetch(host_batches(), mesh=mesh)):
        assert set(batch) == {"frames", "actions"}, sorted(batch)
        for key, width in (("frames", 3), ("actions", 7)):
            arr = batch[key]
            assert arr.shape == (expected_global_rows, width), arr.shape
            # Every host's rows must be present: the global sum over the
            # batch equals the sum of ALL hosts' distinct local rows.
            total = jax.jit(
                jnp.sum,
                out_shardings=jax.NamedSharding(
                    mesh, jax.sharding.PartitionSpec()))(arr)
            total = float(jax.device_get(total.addressable_shards[0].data))
            want = width * sum(
                float(r + 100 * h + 1000 * step)
                for h in range(n) for r in range(local_b))
            assert total == want, (key, step, total, want)
            # And this process's addressable shards hold exactly its own
            # local rows at their global offsets (host h owns rows
            # [h*local_b, (h+1)*local_b) under the mesh's device order).
            for shard in arr.addressable_shards:
                row0 = shard.index[0].start or 0
                host = row0 // local_b
                assert host == idx, (row0, idx)
                local_rows = np.asarray(shard.data)[:, 0]
                start = row0 - idx * local_b
                want_rows = (np.arange(start, start + len(local_rows))
                             + 100 * idx + 1000 * step)
                np.testing.assert_array_equal(local_rows,
                                              want_rows.astype(np.float32))
        seen += 1
    assert seen == steps, seen
    print(f"WORKER_OK {idx}", flush=True)


if __name__ == "__main__":
    main()
