"""r3p: flash-vs-XLA attention crossover in T — pin the auto-routing threshold.

r3o showed the full transformer train step runs 23% FASTER on the XLA
MHA path than on the Pallas flash kernel at the flagship shape (T=375,
B=32, H=4, D=64, bf16): at small T the scores tensor fits HBM cheaply,
XLA's stored-probs backward does 4 matmuls to flash's recompute-7, and
the (B, H) grid's per-program overhead doesn't amortize.  r2w measured
flash 1.67x at T=3000.  Somewhere in between the lines cross; this probe
measures isolated attention fwd+bwd at the production configuration
(dropout 0.1 active, rbg PRNG, bf16) across T and pins the crossover
that ``use_flash='auto'`` routes on.

Loss is sum(out * cos(out)) — a sum() loss lets XLA's algebraic
simplifier rewrite reduce(dot(P, V)) and DCE the output of the forward
(the cotangent of a sum is ones, so O itself is dead), which biases the
comparison against the opaque Pallas kernel.

Writes r3p_tpu.json.
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

OUT = Path(__file__).parent / "r3p_tpu.json"
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    OUT.write_text(json.dumps(RESULTS, indent=2))
    print(f"[flush] {key}: {json.dumps(value)[:240]}", flush=True)


def watchdog(seconds=3000):
    import signal

    def on_alarm(signum, frame):
        flush("watchdog", f"unresponsive for {seconds}s")
        os._exit(3)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(seconds)


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from multimodal_emotion_detection_tpu.ops.flash_attention import (
        flash_attention,
    )

    watchdog()
    jax.config.update("jax_default_prng_impl", "rbg")
    flush("platform", jax.default_backend())

    B, H, D = 32, 4, 64
    RATE = 0.1

    def timeit(f, args, n=30):
        # sync via a VALUE FETCH, never block_until_ready: on the
        # tunneled axon backend block_until_ready can return before
        # execution finishes (bench.py:174; measured 36 PFLOPs from a
        # chained-matmul loop timed that way — this probe's first
        # version shipped that bug and its numbers were discarded)
        float(f(*args))
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = f(*args)
        float(o)
        return (time.perf_counter() - t0) / n * 1e3

    def build(t_len, dtype):
        ks = jax.random.split(jax.random.PRNGKey(0), 4)
        q, k, v = (jax.random.normal(kk, (B, H, t_len, D), dtype)
                   for kk in ks[:3])
        seed = jnp.asarray([7], jnp.int32)
        dkey = jax.random.PRNGKey(1)

        def loss_flash(q, k, v):
            o = flash_attention(q, k, v, dropout_rate=RATE,
                                dropout_seed=seed)
            return jnp.sum(o * jnp.cos(o))

        def loss_xla(q, k, v):
            # the same math flax's MultiHeadDotProductAttention emits for
            # the torch post-softmax-dropout semantics, minus module
            # plumbing: scores in compute dtype, f32 softmax via the
            # standard max-subtraction, rbg keep mask on the probs
            s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(D)
            p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
            keep = jax.random.bernoulli(dkey, 1.0 - RATE, p.shape)
            p = jnp.where(keep, p / (1.0 - RATE), 0.0).astype(q.dtype)
            o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
            return jnp.sum(o * jnp.cos(o))

        def _scalarize(grad_fn):
            # fold grads to one scalar so the timing sync is a single
            # value fetch that depends on every output
            def f(*a):
                g = grad_fn(*a)
                return sum(jnp.sum(x.astype(jnp.float32)) for x in g)
            return f

        gf = jax.jit(_scalarize(jax.grad(loss_flash, argnums=(0, 1, 2))))
        gx = jax.jit(_scalarize(jax.grad(loss_xla, argnums=(0, 1, 2))))
        return gf, gx, (q, k, v)

    for dtype_name, dtype in (("bfloat16", jnp.bfloat16),
                              ("float32", jnp.float32)):
        rows = {}
        for t_len in (256, 375, 512, 768, 1024, 1536, 2048, 3000):
            gf, gx, args = build(t_len, dtype)
            legs = {"flash": 1e9, "xla": 1e9}
            for _ in range(2):  # interleaved rounds
                legs["flash"] = min(legs["flash"], timeit(gf, args))
                legs["xla"] = min(legs["xla"], timeit(gx, args))
            rows[t_len] = {
                "flash_ms": round(legs["flash"], 4),
                "xla_ms": round(legs["xla"], 4),
                "flash_speedup": round(legs["xla"] / legs["flash"], 3),
            }
            flush(f"fwdbwd_dropout_{dtype_name}", rows)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
