from videocad_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    DCN_AXIS,
    MODEL_AXIS,
    batch_sharding,
    create_hybrid_mesh,
    create_mesh,
    replicated,
    shard_batch,
)
from videocad_tpu.parallel.sharding import (  # noqa: F401
    param_pspec,
    param_shardings,
    shard_params,
)
