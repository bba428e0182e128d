"""device_prefetch (the training H2D overlap path) and distributed init."""

import jax
import jax.numpy as jnp
import numpy as np

from videocad_tpu.data.pipeline import device_prefetch
from videocad_tpu.parallel import create_mesh
from videocad_tpu.parallel.distributed import initialize


def _batches(n, with_ids=False):
    for i in range(n):
        batch = {"frames": np.full((4, 3), i, np.float32),
                 "actions": np.full((4, 7), i, np.float32)}
        if with_ids:
            batch["ids"] = [f"id{i}"]
        yield batch


def test_prefetch_preserves_order_and_values():
    out = list(device_prefetch(_batches(5), size=2))
    assert len(out) == 5
    for i, batch in enumerate(out):
        assert isinstance(batch["frames"], jax.Array)
        np.testing.assert_array_equal(np.asarray(batch["frames"]),
                                      np.full((4, 3), i, np.float32))


def test_prefetch_keeps_host_values_and_shards_on_mesh():
    mesh = create_mesh(4, 2)
    out = list(device_prefetch(_batches(3, with_ids=True), mesh=mesh))
    for batch in out:
        assert batch["ids"][0].startswith("id")  # strings stay host-side
        spec = batch["frames"].sharding.spec
        assert spec == jax.sharding.PartitionSpec("data")


def test_prefetch_handles_short_streams():
    assert list(device_prefetch(_batches(1), size=4))  # fewer than size
    assert list(device_prefetch(iter([]), size=2)) == []


def test_distributed_initialize_noop_single_host():
    # no coordinator configured -> stays single-process, returns False
    assert initialize() is False
    assert jax.process_count() == 1
