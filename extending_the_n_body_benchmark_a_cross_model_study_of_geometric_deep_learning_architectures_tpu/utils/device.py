"""Device selection — the JAX replacement for the reference's CUDA device
layer (``utils/get_device.py``, ``utils/gpu_selector.py``).

The reference shells out to nvidia-smi to pick an idle GPU; with JAX the
runtime enumerates accelerators itself, so "auto" is simply the default
device, an integer selects from ``jax.devices()``, and ``"cpu"``/-1 forces
the host platform.
"""

from __future__ import annotations

import subprocess
import sys
import time
from typing import Optional, Union

import jax


def get_device(device_id: Union[int, str, None] = "auto"):
    """Resolve a device spec to a ``jax.Device``."""
    if device_id in (None, "auto"):
        return jax.devices()[0]
    if device_id in (-1, "cpu"):
        return jax.devices("cpu")[0]
    if isinstance(device_id, str) and device_id.isdigit():
        device_id = int(device_id)
    if isinstance(device_id, int):
        devs = jax.devices()
        if 0 <= device_id < len(devs):
            return devs[device_id]
        raise ValueError(f"device index {device_id} out of range ({len(devs)} devices)")
    # platform name, e.g. "tpu"
    return jax.devices(str(device_id))[0]


def backend_healthy(probe_timeout_s: float = 90.0,
                    platform: Optional[str] = None) -> bool:
    """Probe whether the JAX backend can initialize, bounded in time.

    The probe runs ``jax.devices()`` in a *subprocess*: a sick remote-TPU
    plugin can hang backend init for tens of minutes in-process (observed
    ~25 min before ``UNAVAILABLE`` on a dropped tunnel), and a failed init
    may be cached for the process lifetime — a fresh interpreter with a
    hard timeout gives a reliable, bounded answer either way.

    This is the TPU-era analogue of the reference's nvidia-smi health
    checks when picking a usable GPU (``utils/gpu_selector.py:51-99``):
    there the failure mode was a busy/absent GPU, here it is an
    unavailable remote backend.
    """
    expr = "jax.devices()" if platform is None else f"jax.devices({platform!r})"
    code = f"import jax; {expr}; print('OK')"
    try:
        out = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True,
            timeout=probe_timeout_s,
        )
    except subprocess.TimeoutExpired:
        return False
    return out.returncode == 0


def wait_for_backend(max_wait_s: float = 3600.0,
                     probe_timeout_s: float = 90.0,
                     poll_s: float = 60.0,
                     platform: Optional[str] = None,
                     verbose: bool = False) -> bool:
    """Wait until the JAX backend initializes, or ``max_wait_s`` elapses.

    Returns True as soon as a health probe succeeds.  Use before launching
    long unattended training when the accelerator may be temporarily
    unavailable (remote-TPU tunnels drop and recover; the trainer itself
    would otherwise burn its timeout budget hanging in backend init).
    """
    deadline = time.time() + max_wait_s
    while True:
        if backend_healthy(probe_timeout_s=probe_timeout_s, platform=platform):
            return True
        if time.time() >= deadline:
            return False
        if verbose:
            print(f"backend unavailable; retrying in {poll_s:.0f}s", file=sys.stderr)
        time.sleep(min(poll_s, max(0.0, deadline - time.time())))


def describe_devices() -> str:
    lines = []
    for d in jax.devices():
        lines.append(f"[{d.id}] {d.platform}:{d.device_kind}")
    return "\n".join(lines)
