"""r5: measured HBM bandwidth probe (round-5 verdict item 1).

Calibrates the chip's ACHIEVABLE HBM bandwidth with a chained
elementwise-triad kernel (reads N f32, writes N f32 per dispatch; the
x = a*x + b chaining defeats dead-code elimination and overlap), rather
than trusting a datasheet.  The best size's GB/s becomes the denominator
of the bandwidth roofline in utils/flops.py.

Also smoke-checks XLA's compiled cost_analysis(): if the backend reports
'bytes accessed' for a jitted program, bench.py can source per-leg bytes
from the compiler instead of a hand model.

Usage: python benchmarks/r5_bw_probe.py  -> writes r5_bw_probe.json
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def measure_bw(n_floats: int, k_lo: int = 50, k_hi: int = 200,
               repeats: int = 5) -> float:
    """GB/s of x = a*x + b over (n_floats,) f32, k iterations in ONE
    dispatch (fori_loop).  Differential timing — (t(k_hi) - t(k_lo)) /
    (k_hi - k_lo) — cancels the constant dispatch + tunnel-RTT cost that
    a single-k measurement folds into the bandwidth."""
    import functools

    x = jnp.arange(n_floats, dtype=jnp.float32) * 1e-9

    @functools.partial(jax.jit, static_argnums=1)
    def triad_k(x, k):
        return jax.lax.fori_loop(
            0, k,
            lambda i, y: y * jnp.float32(1.0000001) + jnp.float32(1e-12),
            x)

    def timed(k):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            y = triad_k(x, k)
            float(y[0])  # value fetch: tunnel-safe sync
            best = min(best, time.perf_counter() - t0)
        return best

    for k in (k_lo, k_hi):  # warm both compiles
        float(triad_k(x, k)[0])
    dt = timed(k_hi) - timed(k_lo)
    return (k_hi - k_lo) * 2 * n_floats * 4 / dt / 1e9  # read+write/iter


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    dev = jax.devices()[0]
    out = {"device": str(dev), "device_kind": getattr(dev, "device_kind", "")}

    # sizes <=128MB fit the v5e's VMEM across fori_loop iterations — XLA
    # keeps the array on-core and the "bandwidth" measured is VMEM's
    # (observed 3-10 TB/s).  Only sizes well past VMEM measure HBM; both
    # are recorded, only the HBM ones feed the roofline.
    sizes = {
        "16MB": 4 * 1024 * 1024,
        "64MB": 16 * 1024 * 1024,
        "256MB": 64 * 1024 * 1024,
        "1GB": 256 * 1024 * 1024,
        "2GB": 512 * 1024 * 1024,
    }
    bw = {}
    for name, n in sizes.items():
        bw[name] = round(measure_bw(n), 1)
        print(f"triad {name}: {bw[name]} GB/s")
    out["triad_gbs"] = bw
    out["vmem_resident_gbs"] = {k: v for k, v in bw.items()
                                if k in ("16MB", "64MB")}
    out["hbm_bw_gbs"] = max(v for k, v in bw.items()
                            if k in ("256MB", "1GB", "2GB"))

    # does the backend report bytes for a compiled program?
    @jax.jit
    def f(a, b):
        return jnp.tanh(a @ b).sum()

    a = jnp.ones((512, 512), jnp.float32)
    ca = f.lower(a, a).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    keys = sorted(k for k in (ca or {}) if "bytes" in k or k == "flops")
    out["cost_analysis_keys"] = keys
    out["cost_analysis_sample"] = {k: (ca or {}).get(k) for k in keys[:8]}
    print("cost_analysis keys:", keys[:12])

    Path(__file__).with_suffix(".json").write_text(json.dumps(out, indent=2))
    print(json.dumps({"hbm_bw_gbs": out["hbm_bw_gbs"]}))


if __name__ == "__main__":
    main()
