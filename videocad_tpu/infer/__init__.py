from videocad_tpu.infer.rollout import sequential_inference  # noqa: F401
