from videocad_tpu.models.videocadformer import (  # noqa: F401
    VideoCADFormer,
    VideoCADFormerConfig,
    encoder_embed_dim,
)
from videocad_tpu.models.factory import (  # noqa: F401
    FLAGSHIP_NAME,
    create_model,
    example_inputs,
    flagship_config,
    init_model,
    load_named_config,
)
from videocad_tpu.models.vit import ViT, ViTConfig  # noqa: F401
from videocad_tpu.models.resnet import ResNet18GN  # noqa: F401
from videocad_tpu.models.layers import (  # noqa: F401
    MultiHeadAttention,
    TransformerDecoder,
    TransformerDecoderLayer,
    banded_mask,
    causal_mask,
)
