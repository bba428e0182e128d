from videocad_tpu.ops.losses import (  # noqa: F401
    flexible_cross_entropy,
    weighted_cross_entropy,
)
from videocad_tpu.ops.preprocess import (  # noqa: F401
    grayscale_normalize,
    grayscale_normalize_pallas,
    maybe_preprocess,
)
