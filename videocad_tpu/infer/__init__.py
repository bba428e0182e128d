from videocad_tpu.infer.rollout import sequential_inference  # noqa: F401
from videocad_tpu.infer.interpret import attention_rollout, cad_saliency  # noqa: F401
from videocad_tpu.infer.export import export_model, load_exported  # noqa: F401
