"""Test env: genuinely-local CPU backend with 8 virtual devices and x64.

The image's sitecustomize registers the remote-TPU (axon) PJRT plugin at
interpreter startup and hooks platform canonicalisation, so ``JAX_PLATFORMS=
cpu`` set *after* startup still routes execution through the TPU tunnel.
Tests must be hermetic, fast and parallel-deterministic, so when the axon
hook is active we re-run pytest once in a subprocess with the registration
env cleared (suspending pytest's fd capture so the child's output reaches
the terminal)."""

import os
import re
import subprocess
import sys

_NEEDS_REEXEC = bool(os.environ.get("PALLAS_AXON_POOL_IPS"))


def _force_cpu8(env):
    """Pin the hermetic backend: CPU with exactly 8 virtual devices,
    overriding any inherited JAX_PLATFORMS / device-count flag (an exported
    JAX_PLATFORMS=tpu or =4 count would silently change what the suite
    tests)."""
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "", flags)
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()


if not _NEEDS_REEXEC:
    _force_cpu8(os.environ)

    import jax

    jax.config.update("jax_enable_x64", True)

    import pytest

    @pytest.fixture(scope="session")
    def rng_key():
        return jax.random.PRNGKey(0)

    @pytest.fixture()
    def tmp_run_dir(tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        return tmp_path


def pytest_configure(config):
    if not _NEEDS_REEXEC:
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
        except Exception:
            pass
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # sitecustomize skips axon registration
    _force_cpu8(env)
    rc = subprocess.call(
        [sys.executable, "-m", "pytest", *config.invocation_params.args], env=env
    )
    # end this pytest run with the child's status via pytest's own exit path
    # (os._exit would skip plugin teardown and kill programmatic callers of
    # pytest.main outright)
    import pytest

    pytest.exit(f"re-ran hermetically (child exit {rc})", returncode=rc)
