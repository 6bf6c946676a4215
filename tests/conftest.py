"""Test harness config: force an 8-device virtual CPU mesh (SURVEY.md §4).

Subtlety: this container's ``sitecustomize`` (PYTHONPATH=/root/.axon_site)
pre-imports jax at interpreter startup and registers the axon TPU PJRT
plugin, so JAX_PLATFORMS in the environment is already latched by the time
conftest runs. Backends themselves initialize lazily, so
``jax.config.update("jax_platforms", "cpu")`` still wins — unless something
initialized a backend even earlier, in which case we re-exec pytest once with
a corrected environment.
"""

import os
import re
import sys

_FLAG = "--xla_force_host_platform_device_count=8"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " " + _FLAG).strip()
elif not re.search(r"xla_force_host_platform_device_count=8\b", flags):
    # correct a pre-set WRONG count instead of failing the 8-device check
    os.environ["XLA_FLAGS"] = re.sub(
        r"--?xla_force_host_platform_device_count=\d+", _FLAG, flags
    )

import jax  # noqa: E402  (already imported by sitecustomize anyway)

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

if jax.default_backend() != "cpu" or len(jax.devices()) != 8:
    if os.environ.get("S2I_TEST_REEXEC"):
        raise RuntimeError(
            f"tests need an 8-device CPU mesh, got {jax.default_backend()} "
            f"x{len(jax.devices())} even after re-exec"
        )
    if jax.default_backend() != "cpu":
        # A NON-cpu backend is initialized in THIS process: it may hold a
        # TPU relay grant, and execve replaces the image with no teardown —
        # the "killed client wedges the pool for 30-60 min" failure
        # CLAUDE.md forbids. Fail with instructions instead of re-execing.
        raise RuntimeError(
            f"a {jax.default_backend()!r} backend initialized before "
            "conftest could force CPU (re-exec would abandon a possible "
            "TPU relay grant). Launch as: PALLAS_AXON_POOL_IPS= "
            "JAX_PLATFORMS=cpu python -m pytest ..."
        )
    env = dict(os.environ)
    env["S2I_TEST_REEXEC"] = "1"
    env["PALLAS_AXON_POOL_IPS"] = ""  # stops sitecustomize's axon registration
    env["JAX_PLATFORMS"] = "cpu"
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
