"""Honor the JAX_PLATFORMS environment variable from CLI entry points.

Some deployment images install a site plugin that forces the JAX platform
(e.g. a remote-TPU backend) via `jax.config` at interpreter start, which
silently overrides the standard `JAX_PLATFORMS` env var. A user running
`JAX_PLATFORMS=cpu python -m onebit_asr_tpu.cli.prepare ...` then hangs
waiting on an unreachable accelerator tunnel instead of running locally.

Every CLI main calls `respect_jax_platforms_env()` first: if the caller's
environment names a platform, it is re-asserted through `jax.config` so
the env var keeps its documented meaning regardless of site plugins.
(tests/conftest.py does the same dance for the pytest suite.)
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    plat = os.environ.get("JAX_PLATFORMS", "")
    if not plat:
        return
    import jax

    try:
        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except Exception:  # pragma: no cover - config name drift across versions
        pass


def enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a durable directory.

    The unrolled encoder (ModelConfig.scan_unroll=0, the throughput
    default) moved cost from step time into compile time — ~92 s for the
    Conformer-M train step and 162–198 s at L through this environment's
    remote compile service (docs/RESULTS.md). bench.py always cached;
    the user-facing CLIs (train/evaluate/serve/transcribe) call this so
    every cold start after the first reuses the compiled program —
    usability parity with the reference's instant eager start
    (/root/reference/onebit_asr/train.py:243-257 starts stepping
    immediately; we start stepping after one cache hit).

    JAX_COMPILATION_CACHE_DIR in the environment overrides the default
    (~/.jax_cache); setting it to the empty string disables the cache.
    """
    if "JAX_COMPILATION_CACHE_DIR" in os.environ:
        cache_dir = os.environ["JAX_COMPILATION_CACHE_DIR"]
        if not cache_dir:
            return
    else:
        cache_dir = os.path.expanduser("~/.jax_cache")
        os.environ["JAX_COMPILATION_CACHE_DIR"] = cache_dir
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache every compile that takes >=1 s; the default (phase-of-moon
        # across versions) can silently skip medium compiles
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - config name drift
        pass


def set_default_prng_impl() -> None:
    """Align the PRNG impl across ALL CLIs (train/eval/transcribe).

    The TrainState.rng key's SHAPE depends on the impl — threefry (2,),
    rbg (4,) — and checkpoint restore validates leaf shapes strictly, so
    an eval built under a different impl than the train run cannot even
    construct a matching abstract state. train sets rbg for dropout-mask
    throughput (~18% of the 3-branch step, cli/train.py); everyone else
    mirrors it here. JAX_DEFAULT_PRNG_IMPL in the environment overrides —
    set it identically for train AND eval if you change it."""
    import jax

    os.environ.setdefault("JAX_DEFAULT_PRNG_IMPL", "rbg")
    jax.config.update(
        "jax_default_prng_impl", os.environ["JAX_DEFAULT_PRNG_IMPL"]
    )
