"""Invoke ``__graft_entry__.dryrun_multichip`` exactly as the driver does.

Round 1 failed MULTICHIP because 106 green tests never exercised the
driver's invocation: module *imported* (not run as __main__) into an
interpreter whose jax backend is already latched to a single device
(axon TPU in the driver; single-CPU here). The function must detect the
shortfall and re-exec itself onto an ``--xla_force_host_platform_device_count``
CPU mesh in a child interpreter.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _single_device_env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # no axon registration in the child
    env["JAX_PLATFORMS"] = "cpu"
    # Strip the 8-device flag the test conftest added: the driver's
    # interpreter sees exactly ONE device.
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    env.pop("S2I_DRYRUN_CHILD", None)
    env.pop("S2I_TEST_REEXEC", None)
    return env


def test_dryrun_multichip_driver_style():
    code = (
        "import jax; "
        "assert len(jax.devices()) == 1, jax.devices(); "
        "import __graft_entry__; "
        "__graft_entry__.dryrun_multichip(8)"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_single_device_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "dryrun_multichip OK: 8 devices" in proc.stdout


def test_dryrun_child_guard_raises_instead_of_recursing():
    # If the child somehow still lacks devices it must fail loudly, not fork.
    code = (
        "import os\n"
        "os.environ['S2I_DRYRUN_CHILD'] = '1'\n"
        "import __graft_entry__\n"
        "try:\n"
        "    __graft_entry__.dryrun_multichip(8)\n"
        "except RuntimeError as e:\n"
        "    assert 'devices' in str(e); print('GUARD_OK')\n"
        "else:\n"
        "    raise SystemExit('expected RuntimeError')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=_single_device_env(),
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stdout[-4000:]
    assert "GUARD_OK" in proc.stdout
