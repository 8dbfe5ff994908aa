"""Post-hoc temperature scaling that actually works.

The reference's TemperatureScaling.calibrate optimizes T with LBFGS and
then unconditionally raises NotImplementedError
(/root/reference/src/uncertainty.py:416 — SURVEY.md quirk #6).  This
implementation optimizes log T by Newton's method on the (convex in log T)
validation NLL under jit, returning the fitted temperature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


class TemperatureScaling:
    """P_calibrated = softmax(logits / T), T > 0 learned on validation NLL."""

    def __init__(self) -> None:
        self.temperature: float = 1.0

    def __call__(self, logits: jnp.ndarray) -> jnp.ndarray:
        t = max(self.temperature, 1e-6)
        return logits / t

    def calibrate(
        self,
        logits: jnp.ndarray,
        labels: jnp.ndarray,
        max_iter: int = 50,
        tol: float = 1e-8,
    ) -> float:
        logits = jnp.asarray(logits, dtype=jnp.float32)
        labels = jnp.asarray(labels).astype(jnp.int32)

        def nll(log_t):
            scaled = logits / jnp.exp(log_t)
            return optax.softmax_cross_entropy_with_integer_labels(
                scaled, labels
            ).mean()

        grad_fn = jax.grad(nll)
        hess_fn = jax.grad(lambda lt: grad_fn(lt))

        @jax.jit
        def newton_step(log_t):
            g = grad_fn(log_t)
            h = hess_fn(log_t)
            # guarded Newton: fall back to gradient step when curvature ~ 0
            step = jnp.where(jnp.abs(h) > 1e-12, g / h, g)
            return log_t - jnp.clip(step, -1.0, 1.0), jnp.abs(g)

        log_t = jnp.asarray(0.0)
        for _ in range(max_iter):
            log_t, gnorm = newton_step(log_t)
            if float(gnorm) < tol:
                break
        self.temperature = float(jnp.clip(jnp.exp(log_t), 1e-6, 1e6))
        return self.temperature
