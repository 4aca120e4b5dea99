"""Multi-host success-path smoke: two local processes initialize
``jax.distributed`` against a local coordinator, build one mesh spanning
both processes' CPU devices, and run a sharded computation whose collective
crosses the process boundary.

The failure semantics of :func:`initialize_distributed` are covered in
``test_parallel.py``; this exercises the success path (SURVEY.md §5.8's
multi-host claim) end-to-end.  Marked ``slow``: two fresh jax processes +
a distributed handshake take ~30 s on this host.
"""

import os
import re
import socket
import subprocess
import sys
import textwrap

import pytest

pytestmark = pytest.mark.slow

_WORKER = textwrap.dedent(
    """
    import sys

    import jax
    import jax.numpy as jnp
    import numpy as np

    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel import (
        make_mesh,
    )
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.parallel.mesh import (
        SIM_AXIS,
        initialize_distributed,
    )

    coordinator, pid = sys.argv[1], int(sys.argv[2])
    initialize_distributed(
        coordinator_address=coordinator, num_processes=2, process_id=pid,
    )
    assert jax.process_count() == 2, jax.process_count()
    n = len(jax.devices())
    assert n == 4, f"expected 4 global devices, got {n}"

    mesh = make_mesh(n)
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    @partial(
        shard_map, mesh=mesh, in_specs=P(SIM_AXIS, None),
        out_specs=P(None, None),
    )
    def global_sum(x):
        return jax.lax.psum(jnp.sum(x, axis=0, keepdims=True), SIM_AXIS)

    # every process contributes its local shard; the psum crosses processes
    x = jnp.arange(8.0 * 3).reshape(8, 3)
    local = jax.device_put(
        x[pid * 4 : (pid + 1) * 4], jax.local_devices()[0]
    )
    glob = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P(SIM_AXIS, None)), np.asarray(x[pid * 4 : (pid + 1) * 4])
    )
    out = jax.jit(global_sum)(glob)
    got = np.asarray(jax.device_get(out))[0]
    want = np.asarray(x.sum(axis=0))
    np.testing.assert_allclose(got, want, rtol=1e-6)
    print(f"worker {pid} OK: {got.tolist()}")
    """
)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed_smoke(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    )
    # 2 local devices per process -> 4 global devices over 2 processes
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), coordinator, str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"worker {pid} OK" in out
