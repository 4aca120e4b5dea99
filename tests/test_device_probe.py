"""Backend health probe (utils/device.py) — the bounded-time availability
check launcher scripts gate on (TPU-era analogue of the reference's
nvidia-smi GPU health polling, ``utils/gpu_selector.py:51-99``)."""

import extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.utils.device as device_mod


def test_backend_healthy_on_local_cpu():
    # Test env pins JAX_PLATFORMS=cpu, inherited by the probe subprocess.
    assert device_mod.backend_healthy(probe_timeout_s=120.0)


def test_backend_healthy_false_on_unknown_platform():
    assert not device_mod.backend_healthy(
        probe_timeout_s=120.0, platform="no_such_platform"
    )


def test_wait_for_backend_retries_until_probe_succeeds(monkeypatch):
    calls = []

    def fake_probe(probe_timeout_s, platform):
        calls.append(platform)
        return len(calls) >= 3

    monkeypatch.setattr(device_mod, "backend_healthy", fake_probe)
    sleeps = []
    monkeypatch.setattr(device_mod.time, "sleep", sleeps.append)
    assert device_mod.wait_for_backend(max_wait_s=60.0, poll_s=0.01, platform="tpu")
    assert len(calls) == 3
    assert calls == ["tpu"] * 3
    assert len(sleeps) == 2


def test_wait_for_backend_deadline(monkeypatch):
    monkeypatch.setattr(
        device_mod, "backend_healthy", lambda probe_timeout_s, platform: False
    )
    assert not device_mod.wait_for_backend(max_wait_s=0.0, poll_s=0.01)
