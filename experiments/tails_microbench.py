"""Isolate the Conv4Layers tail stage at production shapes: 75 vmapped
models x one 32-trial head chunk (160 windows), bf16 — time fwd and
fwd+bwd for each tails formulation.

    python experiments/tails_microbench.py conv conv2 conv2c
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from imagined_speech_decoding_tpu._hostid import enable_persistent_cache

enable_persistent_cache(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M, B, Z, O, I, T1, K = 75, 160, 8, 32, 32, 246, 5


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:4]))


def main():
    impls = sys.argv[1:] or ["conv", "conv2", "conv2c"]
    rng = np.random.RandomState(0)
    h = jnp.asarray(rng.randn(M, B, Z, I, T1), jnp.bfloat16)
    w3 = jnp.asarray(rng.randn(M, Z, O, I, 1, K) * 0.1, jnp.float32)
    w4 = jnp.asarray(rng.randn(M, Z, O, O, 1, K) * 0.1, jnp.float32)

    from imagined_speech_decoding_tpu.models.heads import _conv4_tails

    for impl in impls:
        def one(w3_, w4_, h_):
            return _conv4_tails({"cnn3": {"w": w3_}, "cnn4": {"w": w4_}}, h_, impl)

        fwd = jax.jit(jax.vmap(one))

        def loss(w3_, w4_, h_):
            return jnp.sum(jax.vmap(one)(w3_, w4_, h_).astype(jnp.float32))

        grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

        # Enqueue all repeats, sync ONCE: per-iteration syncs serialize
        # each call behind the remote tunnel's ~25-40 ms dispatch floor,
        # inflating per-op times by that floor (the r2 numbers in
        # docs/PERFORMANCE.md carried this bias); async dispatch
        # pipelines the floor away so the amortized time is the op's.
        reps = 10

        @jax.jit
        def probe(x):  # on-device reduce: the 1.5 GB output buffer frees
            return jnp.sum(x.astype(jnp.float32).ravel()[:4])  # as the queue drains

        float(probe(fwd(w3, w4, h)))  # warm fwd AND probe outside the timed region
        t0 = time.perf_counter()
        last = None
        for _ in range(reps):
            last = probe(fwd(w3, w4, h))
        float(last)
        t_f = (time.perf_counter() - t0) / reps

        g = grad(w3, w4, h)
        float(probe(g[2]))
        t0 = time.perf_counter()
        for _ in range(reps):
            last = probe(grad(w3, w4, h)[2])
        float(last)
        t_b = (time.perf_counter() - t0) / reps
        flops_f = 2 * 2 * M * B * Z * O * I * K * T1  # two K-tap tail convs
        print(f"{impl:8s} fwd {t_f*1e3:8.2f} ms ({flops_f/t_f/1e12:5.1f} TF/s)"
              f"   fwd+bwd {t_b*1e3:8.2f} ms ({3*flops_f/t_b/1e12:5.1f} TF/s)",
              flush=True)


if __name__ == "__main__":
    main()
