"""r3y: encoder-family refresh under the vblock50 driver + fast knobs.

r3x showed 50-epoch val blocks amortize the per-dispatch overhead to
~the device floor for the LSTM flagship (+10%).  This probe re-banks the
OTHER family points under the same driver (fast knobs: rbg PRNG + bf16
residual streams where the kernels engage):

  gru / cnn / transformer, b32, cached log-mel frontend, vblock50
  (transformer adds a bf16-compute leg — its fast regime per r3n/r3u).

Interleaved, 2 rounds.  Writes r3y_tpu.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3y_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:160]}", flush=True)


def watchdog(seconds=3300):
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

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    watchdog()
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())

    legs = [
        ("gru_f32", dict(encoder="gru")),
        ("cnn_f32", dict(encoder="cnn")),
        ("transformer_f32", dict(encoder="transformer")),
        ("transformer_bf16", dict(encoder="transformer",
                                  compute_dtype="bfloat16")),
    ]
    jax.config.update("jax_default_prng_impl", "rbg")
    lv.set_res2_dtype("bfloat16")
    try:
        for rnd in (1, 2):
            for name, kw in legs:
                cps = B.run_one("logmel_cached", 32, 256, warmup=2,
                                iters=2, block_epochs=50, **kw)
                flush(f"vblock50_{name}_r{rnd}_cps", round(cps, 1))
    finally:
        lv.set_res2_dtype("float32")
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
