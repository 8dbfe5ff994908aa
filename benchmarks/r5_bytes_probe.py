"""r5: XLA cost-analysis bytes semantics probe (round-5 verdict item 1).

Before bench.py can source per-leg HBM bytes from the compiler, two
conventions must be pinned empirically on THIS backend:

1. loop bodies: does 'bytes accessed' of a program whose hot loop is a
   lax.scan scale with trip count (body x trips) or count the body once?
   -> lower the SAME epoch step with S=4 vs S=8 index matrices and
      compare.
2. Pallas custom calls: do they contribute their operand bytes?
   -> lower the flagship per-step program with the Pallas LSTM kernels
      on vs off (XLA scan) and compare magnitudes.

Writes r5_bytes_probe.json with the verdict bench.py relies on.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def lower_epoch(step, state, features, labels, S, B, n_rows):
    import jax.numpy as jnp
    import numpy as np

    mat = jnp.asarray(
        (np.arange(S * B).reshape(S, B)) % n_rows, dtype=jnp.int32)
    valid = jnp.ones((S, B), jnp.float32)
    import jax

    key = jax.random.PRNGKey(0)
    return step.lower(state, features, labels, mat, valid, key)


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import bench
    from multimodal_emotion_detection_tpu.utils.flops import (
        compiled_bytes_accessed,
    )

    out = {}
    B, n_rows = 32, 256

    # 1. scan trip-count convention
    state, step, features, labels = bench._build(
        "logmel_cached", B, n_rows, scan=True)
    b4 = compiled_bytes_accessed(
        lower_epoch(step, state, features, labels, 4, B, n_rows))
    b8 = compiled_bytes_accessed(
        lower_epoch(step, state, features, labels, 8, B, n_rows))
    out["scan_S4_bytes"] = b4
    out["scan_S8_bytes"] = b8
    out["scan_ratio_S8_over_S4"] = round(b8 / b4, 3) if b4 else None
    print(f"epoch-scan bytes: S=4 {b4:.3e}  S=8 {b8:.3e}  "
          f"ratio {b8 / b4:.3f}")

    # 2. per-step program, Pallas kernels on (default flagship route)
    state, step, features, labels = bench._build("logmel_cached", B, n_rows)
    import jax
    import jax.numpy as jnp
    import numpy as np

    idx = jnp.asarray(np.arange(B) % n_rows, jnp.int32)
    valid = jnp.ones((B,), jnp.float32)
    key = jax.random.PRNGKey(0)
    lowered = step.lower(state, features, labels, idx, valid, key)
    bp = compiled_bytes_accessed(lowered)
    out["per_step_pallas_bytes"] = bp
    print(f"per-step (pallas route) bytes: {bp:.3e}")

    # 3. per-step with the kernels disabled -> pure XLA scan route
    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    pf = lv.set_fwd_kernel_mode("off")
    pb = lv.set_bwd_kernel_mode("off")
    try:
        state, step, features, labels = bench._build(
            "logmel_cached", B, n_rows)
        lowered = step.lower(state, features, labels, idx, valid, key)
        bx = compiled_bytes_accessed(lowered)
    finally:
        lv.set_fwd_kernel_mode(pf)
        lv.set_bwd_kernel_mode(pb)
    out["per_step_xla_bytes"] = bx
    print(f"per-step (xla scan route) bytes: {bx:.3e}")

    # hand floor for sanity: params ~1.85M f32, x9 traffic (fwd+bwd+adam)
    # + residuals ~ (375*(4+1+1)*256 + ...)*B*4  — order 1e8 per step
    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=2))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
