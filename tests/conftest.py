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
# NO persistent compile cache for the test suite. Two segfault mechanisms
# were observed loading XLA:CPU AOT cache entries inside
# backend_compile_and_load (rc=139 at tests/test_transcribe.py fixture
# setup, after the loader's own "could lead to SIGILL" warning): entries
# written by the axon/TPU pipeline with target machine features this host
# lacks, and entries written earlier in the SAME suite run by subprocess
# tests under different XLA target-feature flags (+prefer-no-scatter/
# gather). Test compiles are tiny; correctness beats cache hits here.
# The empty string is the CLIs' documented explicit-disable sentinel
# (utils/platform.enable_persistent_compile_cache) and, unlike pop(),
# it is INHERITED by the subprocess CLI round-trip tests — which would
# otherwise re-enable the cache and recreate the mixed-target-feature
# crash in their own processes.
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
jax.config.update("jax_enable_compilation_cache", False)
