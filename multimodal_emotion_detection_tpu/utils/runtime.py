"""Process-level JAX runtime setup shared by all entry points."""

from __future__ import annotations

import os
from pathlib import Path


def setup_jax(
    platform: str | None = None,
    compilation_cache: str | None = "~/.cache/jax-med-tpu",
    matmul_precision: str = "default",
    debug_nans: bool = False,
    prng_impl: str = "threefry2x32",
) -> None:
    """Configure JAX before heavy use.

    * persistent compilation cache (first compile ~20-40s on TPU; cached
      afterwards — and this host has a single CPU core, so caching matters
      for CPU test runs too);
    * optional platform pin, matmul precision, jit-time NaN checking (the
      debug-config equivalent of the reference's determinism/NaN guards,
      SURVEY.md §5 'race detection / sanitizers' row).
    """
    import jax

    if platform:
        # jax.config (not the env var): TPU plugin sitecustomize hooks set
        # jax_platforms at interpreter start, and config beats environment
        jax.config.update("jax_platforms", platform)
    if compilation_cache:
        cache_dir = str(Path(compilation_cache).expanduser())
        Path(cache_dir).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    if matmul_precision and matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", matmul_precision)
    if debug_nans:
        jax.config.update("jax_debug_nans", True)
    if prng_impl and prng_impl != "threefry2x32":
        # 'rbg': the hardware-friendly generator — dropout-heavy configs
        # measured +24% on the transformer step (threefry bit generation
        # was a real cost); streams stay deterministic per key but differ
        # from threefry's, so the default stays threefry for
        # reproducibility against recorded trajectories
        jax.config.update("jax_default_prng_impl", prng_impl)


def setup_from_config(config) -> None:
    rt = config.runtime
    setup_jax(
        platform=rt.platform,
        matmul_precision=rt.matmul_precision,
        debug_nans=rt.debug_nans,
        prng_impl=getattr(rt, "prng_impl", "threefry2x32"),
    )
