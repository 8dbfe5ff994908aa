"""On-chip numerics gate for the Pallas recurrence kernels.

Run on the real TPU (e.g. via the verify skill) after touching any kernel
or bumping the toolchain:

    python scripts/chip_numerics_gate.py

Asserts, with the r2u6 fixed seeds (ops/envelope.py):

1. layer-0 streams (g0, h0, c0) BITWISE equal to the XLA scan — layer 0
   is a single-dot gate step, so both paths issue the same MXU tiling;
   any nonzero diff is a kernel bug, never chaos;
2. layer-1 ys divergence within the pinned chaos envelope at every T —
   a real bug is shape-independent O(1) error and fails every row;
3. production-path (fwd kernel + fused bwd kernel) gradients consistent
   with their own forward via a directional-derivative check.

Exit 0 = PASS (prints one JSON line); nonzero = gate failed.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    from multimodal_emotion_detection_tpu.utils.runtime import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import multimodal_emotion_detection_tpu.ops.lstm_vjp as lv
    from multimodal_emotion_detection_tpu.ops.envelope import (
        GRAD_DIRECTIONAL_REL,
        LSTM2_LAYER0_BITWISE,
        LSTM2_TRAIN_FWD_REL_ENVELOPE,
    )
    from multimodal_emotion_detection_tpu.ops.lstm_kernel import (
        lstm2_train_fwd_pallas,
    )

    b, d, h = 32, 64, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    params = tuple(
        {"w_ih": 0.2 * jax.random.normal(ks[2 + 2 * i], (d if i == 0 else h,
                                                         4 * h)),
         "w_hh": 0.2 * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.02)}
        for i in range(2)
    )

    def cell(hc, gates):
        h_, c_ = hc
        i = jax.nn.sigmoid(gates[..., :h])
        f = jax.nn.sigmoid(gates[..., h:2 * h])
        g = jnp.tanh(gates[..., 2 * h:3 * h])
        o = jax.nn.sigmoid(gates[..., 3 * h:])
        c_n = f * c_ + i * g
        return jnp.tanh(c_n) * o, c_n

    @jax.jit
    def ref_streams(x_tm, keep):
        ih0 = x_tm @ params[0]["w_ih"] + params[0]["b"]

        def step(carry, inp):
            (h0, c0, h1, c1) = carry
            ih0_t, keep_t = inp
            g0 = ih0_t + h0 @ params[0]["w_hh"]
            h0n, c0n = cell((h0, c0), g0)
            x1 = h0n * keep_t
            g1 = (x1 @ params[1]["w_ih"] + params[1]["b"]
                  + h1 @ params[1]["w_hh"])
            h1n, c1n = cell((h1, c1), g1)
            return (h0n, c0n, h1n, c1n), (g0, h0n, c0n, h1n)

        z = jnp.zeros((x_tm.shape[1], h), jnp.float32)
        _, (g0s, h0s, c0s, ys) = jax.lax.scan(step, (z, z, z, z),
                                              (ih0, keep))
        return g0s, h0s, c0s, ys

    report: dict = {"platform": jax.default_backend()}
    failures = []

    for t, bound in sorted(LSTM2_TRAIN_FWD_REL_ENVELOPE.items()):
        x_tm = jax.random.normal(ks[0], (t, b, d))
        keep = (jax.random.uniform(ks[1], (t, b, h)) > 0.2).astype(
            jnp.float32)
        g0r, h0r, c0r, ys_r = (np.asarray(a) for a in ref_streams(x_tm, keep))
        out = jax.jit(
            lambda x, k: lstm2_train_fwd_pallas(x, k, params[0], params[1])
        )(x_tm, keep)
        ys_k, _, g0k, _, h0k, c0k, _ = (np.asarray(a) for a in out)

        layer0 = max(np.abs(g0k - g0r).max(), np.abs(h0k - h0r).max(),
                     np.abs(c0k - c0r).max())
        rel = float(np.abs(ys_k - ys_r).max()
                    / max(np.abs(ys_r).max(), 1e-6))
        report[f"T{t}"] = {"layer0_absmax": float(layer0),
                           "ys_rel": rel, "envelope": bound}
        if layer0 > LSTM2_LAYER0_BITWISE:
            failures.append(f"T={t}: layer-0 streams not bitwise "
                            f"(absmax {layer0:.3e}) — kernel bug")
        if rel > bound:
            failures.append(f"T={t}: ys divergence {rel:.4f} exceeds "
                            f"envelope {bound}")

    # production-path gradient self-consistency at T=375: GRADIENT-ALIGNED
    # directional derivative (a random direction projects to ~1e-5 and the
    # chaotic forward's fd noise swamps it — r2u6's control showed the
    # same for pure XLA; along g/|g| the signal is O(|g|) and a wrong
    # gradient fails at O(1))
    from multimodal_emotion_detection_tpu.ops.envelope import (
        GRAD_DIRECTIONAL_EPS,
        V2_VS_LEGACY_GRAD_REL,
    )

    # same construction as the banked r3c probe (T=372 — the flagship's
    # actual frame count, no padding — and direct (B, T, D) draws); the
    # banked measurement for this exact setup is rel 0.028 at eps 3e-3
    t = 372
    x_bm = jax.random.normal(ks[0], (b, t, d))
    keep_bm = (jax.random.uniform(ks[1], (b, t, 1, h)) > 0.2).astype(
        jnp.float32)
    lv.set_fwd_kernel_mode("auto")
    lv.set_bwd_kernel_mode("auto")

    def loss(x):
        hf = lv.fused_lstm_final(x, keep_bm, params)
        return jnp.sum(hf * jnp.sin(hf)) / (b * h)

    loss_j, grad_j = jax.jit(loss), jax.jit(jax.grad(loss))
    g = grad_j(x_bm)
    v = g / jnp.linalg.norm(g)
    directional = float(jnp.vdot(g, v))
    eps = GRAD_DIRECTIONAL_EPS
    fd = float((loss_j(x_bm + eps * v) - loss_j(x_bm - eps * v)) / (2 * eps))
    grad_rel = abs(fd - directional) / max(abs(fd), 1e-9)
    report["grad_directional"] = {"fd": fd, "grad_dot_v": directional,
                                  "rel": grad_rel}
    if grad_rel > GRAD_DIRECTIONAL_REL:
        failures.append(f"directional-derivative mismatch rel {grad_rel:.2e}")

    # residual-native (v2) vs legacy kernel backward: bitwise on chip.
    # FRESH function object for the legacy leg — jax.jit shares its trace
    # cache across wrappers of one function, so re-jitting ``loss`` after
    # flipping the global would silently reuse the v2 trace (r3g gotcha)
    def loss_legacy(x):
        hf = lv.fused_lstm_final(x, keep_bm, params)
        return jnp.sum(hf * jnp.sin(hf)) / (b * h)

    # scan-reference gradient check (FATAL): jax.grad through the kernel
    # path vs jax.grad through the pure-XLA scan (no custom_vjp), short T
    # where tiling chaos hasn't amplified.  Needs no well-conditioned FD
    # direction, so it also covers maps whose gradient is tiny (the GRU
    # below).  Banked on chip 2026-08-18: LSTM rel ~1e-3-class, GRU
    # 1.2e-3 @ T=50 / 2.1e-3 @ T=100, cosine 1.000000 in all four legs.
    from multimodal_emotion_detection_tpu.ops.envelope import SCAN_GRAD_REL

    def _scan_grad_leg(name, kernel_loss_of, scan_loss_of):
        for t_s, bound in sorted(SCAN_GRAD_REL.items()):
            x_s = jax.random.normal(ks[0], (b, t_s, d))
            keep_s = (jax.random.uniform(ks[1], (b, t_s, 1, h)) > 0.2
                      ).astype(jnp.float32)
            gk = np.asarray(jax.jit(jax.grad(kernel_loss_of(keep_s)))(x_s))
            gs = np.asarray(jax.jit(jax.grad(scan_loss_of(keep_s)))(x_s))
            rel = float(np.abs(gk - gs).max() / max(np.abs(gs).max(), 1e-9))
            report[f"{name}_scan_grad_T{t_s}"] = {"rel": rel, "bound": bound}
            if rel > bound:
                failures.append(
                    f"{name} kernel grad diverges from scan grad at "
                    f"T={t_s}: rel {rel:.3e} > {bound}")

    # dedicated 1/sqrt(h) (torch-default-scale) params for the scan-grad
    # legs: the envelope legs above deliberately use 0.2-scale params to
    # sit in the chaos regime, but gradients AMPLIFY that chaos (measured
    # rel 5.7e-2 at T=100 with 0.2-scale vs 1.2e-3 at 1/sqrt(h)) — the
    # scan-grad check pins backward-math correctness, so it runs in the
    # well-conditioned production-init regime where fp divergence between
    # two correct implementations stays ~1e-3 flat across T
    lscale = 1.0 / np.sqrt(h)
    lparams_sg = tuple(
        {"w_ih": lscale * jax.random.normal(ks[2 + 2 * i],
                                            (d if i == 0 else h, 4 * h)),
         "w_hh": lscale * jax.random.normal(ks[3 + 2 * i], (h, 4 * h)),
         "b": jnp.full((4 * h,), 0.02)}
        for i in range(2)
    )

    def _lstm_kernel_loss(keep_s):
        def f(xx):
            hf = lv.fused_lstm_final(xx, keep_s, lparams_sg)
            return jnp.sum(hf * jnp.sin(hf)) / (b * h)
        return f

    def _lstm_scan_loss(keep_s):
        def f(xx):
            x_tm2 = jnp.swapaxes(xx, 0, 1)
            carry, _, _ = lv._fwd_scan(x_tm2, lv._keep_tm(keep_s),
                                       lparams_sg)
            hf = carry[-1][0]
            return jnp.sum(hf * jnp.sin(hf)) / (b * h)
        return f

    _scan_grad_leg("lstm", _lstm_kernel_loss, _lstm_scan_loss)

    dx_v2 = np.asarray(g)
    lv.set_res2_mode("off")
    dx_leg = np.asarray(jax.jit(jax.grad(loss_legacy))(x_bm))
    lv.set_res2_mode("auto")
    v2_rel = float(np.abs(dx_v2 - dx_leg).max()
                   / max(np.abs(dx_leg).max(), 1e-9))
    report["v2_vs_legacy_dx_rel"] = v2_rel
    if v2_rel > V2_VS_LEGACY_GRAD_REL:
        failures.append(f"v2 backward diverges from legacy: rel {v2_rel:.2e}")

    # ---- GRU twin (r3l residual-native pair): same two checks ----
    # torch-default 1/sqrt(h) weight scale: at 0.2 the GRU map is
    # chaos-dominated over 372 steps (n = tanh(xn + r*hn) lacks the
    # LSTM's forget-gate damping) and the FD measured rel 1.12 even
    # though v2-vs-legacy was bitwise — the failure was the map's
    # conditioning, not the gradients (r2u6's lesson again)
    gscale = 1.0 / np.sqrt(h)
    gparams = tuple(
        {"w_ih": gscale * jax.random.normal(ks[2 + 2 * i],
                                            (d if i == 0 else h, 3 * h)),
         "w_hh": gscale * jax.random.normal(ks[3 + 2 * i], (h, 3 * h)),
         "b_ih": jnp.full((3 * h,), 0.02),
         "b_hh": jnp.full((3 * h,), 0.01)}
        for i in range(2)
    )

    def gloss(x):
        hf = lv.fused_gru_final(x, keep_bm, gparams)
        return jnp.sum(hf * jnp.sin(hf)) / (b * h)

    gloss_j, ggrad_j = jax.jit(gloss), jax.jit(jax.grad(gloss))
    gg = ggrad_j(x_bm)
    gv = gg / jnp.linalg.norm(gg)
    gdirectional = float(jnp.vdot(gg, gv))
    gfd = float((gloss_j(x_bm + eps * gv) - gloss_j(x_bm - eps * gv))
                / (2 * eps))
    ggrad_rel = abs(gfd - gdirectional) / max(abs(gfd), 1e-9)
    report["gru_grad_directional"] = {
        "fd": gfd, "grad_dot_v": gdirectional, "rel": ggrad_rel}
    # REPORT-ONLY, permanently: the 2026-08-18 chip run measured rel
    # 2.8e-1 at fd 9.8e-4 — the GRU's gradient for this loss is tiny at
    # 1/sqrt(h) scale, so the eps=3e-3 FD quotient is noise-dominated at
    # ANY T (T=50 measured fd_rel 3.0e-1 with the scan-vs-kernel grads
    # agreeing to 1.2e-3, cosine 1.000000).  The FATAL gradient check
    # for the GRU is the scan-reference leg below + the bitwise
    # v2-vs-legacy assert.
    if ggrad_rel > GRAD_DIRECTIONAL_REL:
        report["gru_grad_directional"]["note"] = (
            f"rel {ggrad_rel:.2e} above {GRAD_DIRECTIONAL_REL}: "
            "ill-conditioned FD (|fd| ~1e-3), report-only; see "
            "gru_scan_grad_T* for the fatal check")

    def _gru_kernel_loss(keep_s):
        def f(xx):
            hf = lv.fused_gru_final(xx, keep_s, gparams)
            return jnp.sum(hf * jnp.sin(hf)) / (b * h)
        return f

    def _gru_scan_loss(keep_s):
        def f(xx):
            x_tm2 = jnp.swapaxes(xx, 0, 1)
            carry, _, _ = lv._gru_fwd_scan(x_tm2, lv._keep_tm(keep_s),
                                           gparams)
            hf = carry[-1]
            return jnp.sum(hf * jnp.sin(hf)) / (b * h)
        return f

    _scan_grad_leg("gru", _gru_kernel_loss, _gru_scan_loss)

    def gloss_legacy(x):
        hf = lv.fused_gru_final(x, keep_bm, gparams)
        return jnp.sum(hf * jnp.sin(hf)) / (b * h)

    gdx_v2 = np.asarray(gg)
    lv.set_res2_mode("off")
    gdx_leg = np.asarray(jax.jit(jax.grad(gloss_legacy))(x_bm))
    lv.set_res2_mode("auto")
    gv2_rel = float(np.abs(gdx_v2 - gdx_leg).max()
                    / max(np.abs(gdx_leg).max(), 1e-9))
    report["gru_v2_vs_legacy_dx_rel"] = gv2_rel
    if gv2_rel > V2_VS_LEGACY_GRAD_REL:
        failures.append(
            f"GRU v2 backward diverges from legacy: rel {gv2_rel:.2e}")

    report["pass"] = not failures
    report["failures"] = failures
    print(json.dumps(report))
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
