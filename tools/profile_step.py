"""Capture a jax.profiler trace of the flagship train step on the live chip.

    python tools/profile_step.py [trace_dir] [batch_size] [seq_len]

Produces a TensorBoard-compatible trace under trace_dir (default
/tmp/videocad_trace) for op-level breakdown of the step — the TPU
equivalent of the reference's torch.profiler integration
(/root/reference/trainer.py:394-439).
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from bench import FLAGSHIP, LOSS_CONFIG  # noqa: E402
from videocad_tpu.data.synthetic import synthetic_batch_feed  # noqa: E402
from videocad_tpu.models import create_model, init_model  # noqa: E402
from videocad_tpu.train import make_train_step  # noqa: E402
from videocad_tpu.train.state import create_train_state  # noqa: E402


def main(trace_dir="/tmp/videocad_trace", batch_size=8, seq_len=192):
    model = create_model(FLAGSHIP)
    params = init_model(model, jax.random.PRNGKey(0), batch=1, seq_len=2)
    state, tx = create_train_state(params, {"lr": 1e-5})
    feed = synthetic_batch_feed(batch_size, seq_len, image_size=224,
                                channels=3, seed=0)
    batch = {k: jax.device_put(jnp.asarray(v)) for k, v in feed.items()}
    step = jax.jit(make_train_step(model, tx, LOSS_CONFIG),
                   donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    state, loss, _ = step(state, batch, rng)  # compile
    float(loss)
    with jax.profiler.trace(trace_dir):
        for _ in range(3):
            state, loss, _ = step(state, batch, rng)
        float(loss)
    print(f"trace written to {trace_dir}")


if __name__ == "__main__":
    args = sys.argv[1:]
    main(*(args[:1] + [int(a) for a in args[1:3]]))
