"""videocad_tpu — a TPU-native (JAX/XLA/Pallas/pjit) behavior-cloning framework
for long-horizon CAD UI interaction, with the capabilities of VideoCAD.

Capabilities mirrored from the reference (see /root/reference):
  * offline ETL: mouse-log parsing -> 7-dim action vectors, video -> frame shards
  * input pipeline: sharded dataset index, padded/bucketed batching, prefetch
  * models: VideoCADFormer (windowed-cross-attention action decoder over
    per-frame ViT/ResNet encodings of UI history + a target CAD image)
  * training: data-parallel pjit train step, class-weighted tolerance CE,
    rich accuracy metrics, early stopping, Orbax checkpoint/resume
  * inference: O(T) KV-cached `lax.scan` autoregressive rollout
  * evaluation: teacher-forced + sequential eval, first-mistake analysis,
    plots, and an LLM video-QA harness

The design is TPU-first, not a port: functional pytree models, static
shapes with sequence-length bucketing, SPMD over a `jax.sharding.Mesh`
(data/model axes), and Pallas kernels for the banded-attention and
image-preprocessing hot paths.
"""

__version__ = "0.1.0"
