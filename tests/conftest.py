"""Test harness config: run all tests on a fake 8-device CPU mesh.

Mirrors the standard JAX trick for testing multi-chip sharding without
hardware. The env vars must be set before jax initializes; additionally, a
site plugin in this image may force `jax_platforms` to a TPU backend at
interpreter start, so we re-force the CPU platform through jax.config after
import — this also keeps compilation local (the TPU path routes every
compile through a remote service, which would serialize the test suite).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# DEDICATED cache dir for the CPU test suite — never share ~/.jax_cache
# with the axon/TPU processes: their pipeline writes XLA:CPU AOT entries
# whose target machine features don't match this host, and LOADING such
# an entry segfaults the test run inside backend_compile_and_load
# (observed at tests/test_transcribe.py fixture setup, rc=139; the AOT
# loader warns "could lead to execution errors such as SIGILL" first).
os.environ["JAX_COMPILATION_CACHE_DIR"] = os.path.expanduser(
    "~/.jax_cache_cputests"
)
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
