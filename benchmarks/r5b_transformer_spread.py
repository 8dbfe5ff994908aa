"""r5b: pin the transformer leg's run-to-run spread (round-5 verdict 2).

BENCH_r04 measured 15,103 clips/s; the r4f trace run measured 12.0k under
the same driver — a ~20-25% spread, bigger than most effects this repo
A/Bs.  This probe separates the candidate modes:

* INTRA-process, same compiled program, repeated timed blocks
  -> execution-time variance (clock throttling, HBM contention).
* INTER-process: fresh process per run (fresh compile; the persistent
  cache serves the same binary unless autotuning is nondeterministic)
  -> compilation/layout variance + process-level host jitter.

Each sample is the SAME leg bench.py times: b32 bf16 transformer,
logmel_cached, vblock50 driver (2 timed blocks of 50 epochs x 8 steps).

Usage:
    python benchmarks/r5b_transformer_spread.py          # intra (N=10)
    python benchmarks/r5b_transformer_spread.py --child  # one sample
    python benchmarks/r5b_transformer_spread.py --inter  # inter (N=6)
Writes r5b_transformer_spread.json (append-merge across modes).
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

OUT = Path(__file__).with_suffix(".json")


def one_sample_cps(reuse=None):
    """One bench-identical sample; with ``reuse`` (state, step, ...) the
    compiled program is reused (intra-process mode).  The state is
    CHAINED between samples — the step donates its input buffers, so
    re-passing an already-donated state errors the second call."""
    import jax

    import bench

    jax.config.update("jax_default_prng_impl", "rbg")
    if reuse is None:
        reuse = bench._build("logmel_cached", 32, 256, scan="block",
                             compute_dtype="bfloat16",
                             encoder="transformer")
    state, step, features, labels = reuse
    cps, state = bench._time_epoch_block(
        state, step, features, labels, 32, 256,
        warmup_blocks=1, blocks=2, epochs_per_block=50)
    return cps, (state, step, features, labels)


def merge(key, payload):
    data = json.loads(OUT.read_text()) if OUT.exists() else {}
    data[key] = payload
    OUT.write_text(json.dumps(data, indent=2))


def summarize(samples):
    med = statistics.median(samples)
    return {
        "n": len(samples),
        "samples_clips_per_sec": [round(s, 1) for s in samples],
        "median": round(med, 1),
        "mean": round(statistics.mean(samples), 1),
        "min": round(min(samples), 1),
        "max": round(max(samples), 1),
        "spread_pct_of_median": round(
            100 * (max(samples) - min(samples)) / med, 2),
        "stdev_pct_of_median": round(
            100 * (statistics.stdev(samples) / med), 2)
        if len(samples) > 1 else 0.0,
    }


def main():
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    if "--child" in sys.argv:
        setup_jax()
        cps, _ = one_sample_cps()
        print("CHILD_RESULT", cps)
        return

    if "--inter" in sys.argv:
        samples = []
        for i in range(6):
            t0 = time.perf_counter()
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                capture_output=True, text=True, timeout=1200)
            for line in (proc.stdout or "").splitlines():
                if line.startswith("CHILD_RESULT "):
                    samples.append(float(line.split()[1]))
            print(f"inter[{i}]: {samples[-1] if samples else 'FAIL'} "
                  f"({time.perf_counter() - t0:.0f}s)")
        merge("inter_process", summarize(samples))
        print(json.dumps(summarize(samples)))
        return

    # intra-process: one compile, 10 timed samples
    setup_jax()
    samples = []
    reuse = None
    for i in range(10):
        cps, reuse = one_sample_cps(reuse)
        samples.append(cps)
        print(f"intra[{i}]: {cps:.1f} clips/s")
    merge("intra_process", summarize(samples))
    print(json.dumps(summarize(samples)))


if __name__ == "__main__":
    main()
