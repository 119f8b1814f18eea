"""Import hygiene: no module may initialize a JAX backend at import time.

A module-level `jnp.<anything>(...)` array constant initializes the JAX
backend during `import` — BEFORE a CLI `main()` can re-assert the platform
the caller asked for via JAX_PLATFORMS (utils/platform.py). On a machine
whose TPU tunnel is unreachable that turns every
`python -m onebit_asr_tpu.eval` into an indefinite hang (observed live:
decode/beam_device.py's former module-level `jnp.uint32` hash constants).
Backend selection belongs to entry points, not imports.

The tripwire monkeypatches jax's backend-resolution entry points to raise,
then imports every module in the package in a fresh interpreter (fresh so
modules already imported by conftest/other tests are re-executed).
"""

from __future__ import annotations

import subprocess
import sys

import pytest

_SCRIPT = r"""
import jax
import jax._src.xla_bridge as xb

def boom(*a, **k):
    raise RuntimeError("BACKEND INIT DURING IMPORT")

xb.backends = boom
xb.get_backend = boom

import importlib, pkgutil
import onebit_asr_tpu

bad, errors = [], []
for m in pkgutil.walk_packages(onebit_asr_tpu.__path__, "onebit_asr_tpu."):
    if m.name.endswith("__main__"):  # running a __main__ IS an entry point
        continue
    try:
        importlib.import_module(m.name)
    except RuntimeError as e:
        if "BACKEND INIT" in str(e):
            bad.append(m.name)
        else:
            errors.append((m.name, repr(e)))
    except Exception as e:  # import must not fail for any other reason
        errors.append((m.name, repr(e)))
assert not bad, f"modules initializing a backend at import: {bad}"
assert not errors, f"modules failing to import: {errors}"
print("import-hygiene-ok")
"""


def test_no_backend_init_at_import():
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "import-hygiene-ok" in out.stdout


def test_installed_package_imports_from_anywhere(tmp_path):
    """After `pip install -e .` (pyproject.toml), the package must import
    with a cwd outside the repo and without the repo root on sys.path.
    Skips when the package isn't installed (fresh checkout)."""
    import importlib.util

    probe = subprocess.run(
        [sys.executable, "-c",
         "import importlib.metadata as m; m.version('onebit-asr-tpu')"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=120,
    )
    if probe.returncode != 0:
        import pytest

        pytest.skip("onebit-asr-tpu not pip-installed in this environment")
    out = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path = [p for p in sys.path if p not in "
         "('', '/root/repo')]; import onebit_asr_tpu; "
         "from onebit_asr_tpu.utils.config import ModelConfig; "
         "print('pkg-ok', ModelConfig().enc_d_model)"],
        capture_output=True, text=True, cwd=str(tmp_path), timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pkg-ok 256" in out.stdout

# core-correctness quick tier: `pytest -m quick` gives a <5-minute signal;
# the full suite remains the round gate (README testing section)
pytestmark = pytest.mark.quick
