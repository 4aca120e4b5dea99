"""Device selection — the JAX replacement for the reference's CUDA device
layer (``utils/get_device.py``, ``utils/gpu_selector.py``).

The reference shells out to nvidia-smi to pick an idle GPU; with JAX the
runtime enumerates accelerators itself, so "auto" is simply the default
device, an integer selects from ``jax.devices()``, and ``"cpu"``/-1 forces
the host platform.
"""

from __future__ import annotations

from typing import Union

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


def describe_devices() -> str:
    lines = []
    for d in jax.devices():
        lines.append(f"[{d.id}] {d.platform}:{d.device_kind}")
    return "\n".join(lines)
