"""r3x: is the headline-vs-device-floor gap per-dispatch overhead?

r3w measured the fast-config device while-body at 0.78 ms/step while the
vblock headline runs ~0.91 ms/step — a ~0.13 ms/step gap.  If that gap
is per-DISPATCH overhead (tunnel RTT + host work, amortized over the 80
steps of a 10-epoch block), tripling the block (240 steps/dispatch)
should close most of it; if it is per-step (state copies, driver math),
block size won't matter.  Interleaved A/B over
training.val_every_n_epochs = 10 / 30 / 50 under the fast knobs.

Writes r3x_tpu.json.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench as B  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "r3x_tpu.json")
RESULTS: dict = {}


def flush(key, value):
    RESULTS[key] = value
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=2)
    print(f"[flush] {key}: {json.dumps(value)[:160]}", flush=True)


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

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv

    watchdog()
    if os.path.exists(OUT):
        try:
            RESULTS.update(json.load(open(OUT)))
        except Exception:  # noqa: BLE001
            pass
    flush("platform", jax.default_backend())

    jax.config.update("jax_default_prng_impl", "rbg")
    lv.set_res2_dtype("bfloat16")
    try:
        # per-epoch dispatch reference + three block sizes, interleaved
        for rnd in (1, 2):
            cps = B.run_one("logmel_cached", 32, 256, warmup=2, iters=10,
                            epoch_scan=True)
            flush(f"escan_perepoch_r{rnd}_cps", round(cps, 1))
            for e_block, iters in ((10, 3), (30, 2), (50, 2)):
                cps = B.run_one("logmel_cached", 32, 256, warmup=2,
                                iters=iters, block_epochs=e_block)
                flush(f"vblock{e_block}_r{rnd}_cps", round(cps, 1))
    finally:
        lv.set_res2_dtype("float32")
        jax.config.update("jax_default_prng_impl", "threefry2x32")
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
