"""r3aa: name the big-config mask-pipeline ops in the compiled TPU HLO.

r3z's trace shows ~5 ms/step of rng/compare/broadcast ops at the
b256-bf16 big config.  This probe compiles the same epoch step, fetches
the optimized HLO text, and banks the definitions of the expensive ops
(broadcast.5451 + clones, the big fusions, rng-bit-generator) so the
lever — if any — is designed against the real graph, not guessed from
trace op names.

Writes r3aa_tpu.json.
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3aa_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {str(value)[:200]}", flush=True)


def watchdog(seconds=2700):
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

    watchdog()
    flush("platform", jax.default_backend())
    jax.config.update("jax_default_prng_impl", "rbg")

    batch, n_rows = 256, 256
    st, ep, feats, labels = B._build(
        "logmel_cached", batch, n_rows, compute_dtype="bfloat16",
        scan=True, big=True)
    S = 8
    mats = jnp.asarray(
        (np.arange(S * batch).reshape(S, batch)) % n_rows, jnp.int32)
    valid = jnp.ones((S, batch), jnp.float32)
    key = jax.random.PRNGKey(0)

    lowered = jax.jit(ep).lower(st, feats, labels, mats, valid, key)
    txt = lowered.compile().as_text()
    flush("hlo_bytes", len(txt))

    # bank every definition line for the ops the r3z trace flagged,
    # plus any line defining a tensor >= 64 MB (the mask-sized class)
    wanted = re.compile(
        r"^\s*%?(broadcast\.5451|rng-bit-generator|compare_select_fusion"
        r"|fusion\.10(26|30|31|33|34)|dynamic-slice_bitcast_fusion)"
    )
    lines = []
    for ln in txt.splitlines():
        if wanted.search(ln):
            lines.append(ln.strip()[:400])
    flush("flagged_defs", lines[:80])

    big_shape = re.compile(r"(bf16|f32)\[(\d+)[^\]]*\]")
    bigs = []
    for ln in txt.splitlines():
        m = big_shape.search(ln)
        if not m:
            continue
        dims = re.findall(r"\d+", ln.split("]")[0].split("[")[-1])
        try:
            n = int(np.prod([int(d) for d in dims]))
        except Exception:  # noqa: BLE001
            continue
        bytes_ = n * (2 if m.group(1) == "bf16" else 4)
        if bytes_ >= 64 * 1024 * 1024 and ("broadcast" in ln
                                           or "transpose" in ln
                                           or "copy" in ln):
            bigs.append(ln.strip()[:400])
    flush("big_materializations", bigs[:40])
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
