"""Compile-only probe for the v3 streaming kernel on the real TPU.

The big-N bench's streaming rows failed with a truncated remote-compile
HTTP 500; this probes which (N, tile_i, tile_j, dtype) configs actually
compile, WITHOUT running them (AOT lower+compile only), so it can run
while another process holds the chip for execution.

Usage: python scripts/stream_compile_probe.py [N:ti:tj ...]
"""
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas.egnn_stream import (
    streaming_egnn_messages,
)

He = Hc = 128


def probe(n, ti, tj, dtype, ebf):
    B = 2
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    mk = lambda i, s: jax.random.normal(ks[i], s, jnp.float32) * 0.1
    args = (
        mk(0, (B, n, He)).astype(dtype), mk(1, (B, n, He)).astype(dtype),
        mk(2, (B, n, 3)), mk(3, (B, n, 3)), jnp.ones((B, n, 1), jnp.float32),
        mk(4, (B, n, 3)), jnp.ones((B, n, n), bool),
        mk(5, (5, He)).astype(dtype), mk(6, (He, He)).astype(dtype),
        mk(7, (He,)).astype(dtype), mk(8, (He, Hc)).astype(dtype),
        mk(9, (Hc,)).astype(dtype), mk(10, (Hc,)).astype(dtype),
    )
    lowered = jax.jit(
        lambda *a: streaming_egnn_messages(
            *a, tanh=True, norm_diff=True, tile_i=ti, tile_j=tj,
            elem_bf16=ebf,
        )
    ).lower(*args)
    lowered.compile()


def main():
    specs = sys.argv[1:] or [
        "100:32:104", "100:16:104", "256:32:128", "256:16:128",
        "256:32:256", "512:32:128", "1024:32:128",
    ]
    for spec in specs:
        n, ti, tj = (int(x) for x in spec.split(":"))
        for dtype, dn in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            for ebf in (False, True):
                tag = f"N={n:5d} ti={ti:3d} tj={tj:3d} {dn}{' ebf' if ebf else ''}"
                try:
                    probe(n, ti, tj, dtype, ebf)
                    print(f"{tag}: COMPILE OK", flush=True)
                except Exception as e:
                    msg = " ".join(str(e).split())
                    print(f"{tag}: FAIL {msg[:400]}", flush=True)


if __name__ == "__main__":
    main()
