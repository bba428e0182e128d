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


def test_prefetch_routes_jax_arrays_through_local_shard(monkeypatch):
    """A batch already converted to jax arrays must NOT slip past the
    multi-host assembly path: on a pod, a host-local jax array reaching the
    jitted step as-is silently trains on 1/num_hosts of the data."""
    from videocad_tpu.parallel import mesh as mesh_mod

    mesh = create_mesh(4, 2)
    seen = []
    real = mesh_mod.put_local_shard

    def spy(x, sharding):
        seen.append(np.asarray(x).shape)
        return real(x, sharding)

    monkeypatch.setattr(mesh_mod, "put_local_shard", spy)
    jax_batches = iter([{k: jnp.asarray(v) for k, v in b.items()}
                        for b in _batches(2)])
    out = list(device_prefetch(jax_batches, mesh=mesh))
    assert len(out) == 2
    # frames + actions per batch, all routed through put_local_shard
    assert len(seen) == 4
    for batch in out:
        assert batch["frames"].sharding.spec == jax.sharding.PartitionSpec("data")


def test_trainer_hot_loop_batches_stay_numpy():
    """The train loop hands numpy (never jax) batches to device_prefetch so
    put_local_shard owns device placement on multi-process meshes."""
    from videocad_tpu.train.trainer import _numpy_batch

    batch = {"frames": jnp.ones((2, 3)), "actions": np.zeros((2, 7)),
             "ids": ["a", "b"]}
    out = _numpy_batch(batch)
    assert set(out) == {"frames", "actions"}  # non-arrays filtered
    for v in out.values():
        assert type(v) is np.ndarray


def test_distributed_initialize_reraises_real_failures(monkeypatch):
    """Only double-initialization is swallowed; a broken pod launch
    (unreachable coordinator, bad topology) must fail loudly at startup."""
    import videocad_tpu.parallel.distributed as dist_mod

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")

    def boom(**kwargs):
        raise RuntimeError("failed to connect to coordinator")

    monkeypatch.setattr(jax.distributed, "initialize", boom)
    try:
        dist_mod.initialize()
        raised = False
    except RuntimeError:
        raised = True
    assert raised

    def dupe(**kwargs):
        raise RuntimeError("jax.distributed is already initialized")

    monkeypatch.setattr(jax.distributed, "initialize", dupe)
    assert dist_mod.initialize() is True
