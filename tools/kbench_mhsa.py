"""Kernel-only TPU compile + timing harness for the fused-MHSA kernels.

    python tools/kbench_mhsa.py [B] [T] [HD] [H]

Compiles and times just `mhsa_short`'s fwd+bwd at the flagship shape
(default 1528 x 50 x 1024, 16 heads, dropout 0.1) instead of the whole
train step — a Mosaic VMEM/lowering failure or a kernel-level regression
surfaces in ~4 minutes here vs ~20 for a full `bench.py` run. Use this
FIRST for any fused-attention change; docs/PERF.md's round-5 negative
result (transposed-I/O "v6", 23.68 vs 9.76 ms/iter) was decided with it.

Run from the repo root (the axon TPU backend registers via the default
interpreter path; `python tools/kbench_mhsa.py`).
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from videocad_tpu.ops.fused_attention import mhsa_short  # noqa: E402


def main() -> None:
    args = [int(a) for a in sys.argv[1:]]
    b, t, hd, h = args + [1528, 50, 1024, 16][len(args):]

    def loss(q, k, v, seed):
        return jnp.sum(mhsa_short(q, k, v, seed, h, 0.1).astype(jnp.float32))

    fn = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))

    key = jax.random.PRNGKey(0)
    qkv = [jax.random.normal(k_, (b, t, hd), jnp.bfloat16)
           for k_ in jax.random.split(key, 3)]
    seed = jnp.int32(7)

    t0 = time.time()
    out = fn(*qkv, seed)
    # float() is the reliable device barrier on the axon tunnel.
    val = float(out[0])
    print(f"compile+first-run OK in {time.time() - t0:.1f}s, loss={val:.3f}")

    for tag, iters in (("warm", 3), ("timed", 20)):
        t0 = time.time()
        for _ in range(iters):
            out = fn(*qkv, seed)
        _ = float(out[0])
        dt = (time.time() - t0) / iters
        print(f"{tag}: {dt * 1e3:.2f} ms/iter (fwd+bwd, B={b})")


if __name__ == "__main__":
    main()
