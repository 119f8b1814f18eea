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
