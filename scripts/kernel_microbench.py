"""Micro-benchmark: fused EGNN message kernel vs the XLA dense equivalent.

One layer's edge stage at the headline bench shape, timed standalone —
fast iteration for kernel tuning without the full rollout bench.

Run on TPU:  python scripts/kernel_microbench.py [tile ...]
"""

import os
import sys
import time

# allow `python scripts/kernel_microbench.py` without PYTHONPATH (extend,
# never overwrite — the image's PYTHONPATH carries the remote-TPU plugin)
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp

from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas.egnn_messages import (
    fused_egnn_messages,
)

B, N, H, He, Hc = 64, 100, 128, 128, 128
REPEAT = 20


def sync(x):
    return float(jnp.sum(x))


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [16, 32]
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    mk = lambda i, shape, scale=0.1: jax.random.normal(ks[i], shape, jnp.float32) * scale
    hA = mk(0, (B, N, He))
    hB = mk(1, (B, N, He))
    geom = mk(2, (B, N, N, 8))
    mask = jnp.ones((B, N, N), bool) & ~jnp.eye(N, dtype=bool)
    w_geom = mk(3, (5, He))
    W2 = mk(4, (He, He))
    b2 = mk(5, (He,))
    Wc1 = mk(6, (He, Hc))
    bc1 = mk(7, (Hc,))
    wc2 = mk(8, (Hc,))

    @jax.jit
    def xla_ref(hA, hB, geom, mask, w_geom, W2, b2, Wc1, bc1, wc2):
        m1 = jax.nn.silu(
            hA[:, :, None, :] + hB[:, None, :, :]
            + jnp.einsum("bijg,gh->bijh", geom[..., :5], w_geom)
        )
        m2 = jax.nn.silu(m1 @ W2 + b2)
        mf = mask.astype(m2.dtype)[..., None]
        cnt = jnp.clip(mf.sum(2), 1.0, None)
        agg = (m2 * mf).sum(2) / cnt
        w = jax.nn.silu(m2 @ Wc1 + bc1) @ wc2[:, None]
        w = jnp.tanh(w)
        trans = jnp.clip(w * geom[..., 5:8], -100, 100)
        tmean = (trans * mf).sum(2) / cnt
        return agg, tmean

    def bench(fn, *args, **kw):
        out = fn(*args, **kw)
        sync(out[0])  # compile + run
        t0 = time.time()
        for _ in range(REPEAT):
            out = fn(*args, **kw)
        sync(out[0])
        return (time.time() - t0) / REPEAT * 1000

    ws = (w_geom, W2, b2, Wc1, bc1, wc2)
    ms = bench(xla_ref, hA, hB, geom, mask, *ws)
    print(f"xla dense f32:        {ms:7.2f} ms/layer-call", flush=True)
    bf = jnp.bfloat16
    ms = bench(
        xla_ref, hA.astype(bf), hB.astype(bf), geom.astype(bf), mask,
        *(w.astype(bf) for w in ws),
    )
    print(f"xla dense bf16:       {ms:7.2f} ms/layer-call", flush=True)
    for version in (1, 2):
        for dtype, dn in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
            for tile in tiles:
                try:
                    ms = bench(
                        fused_egnn_messages,
                        hA.astype(dtype), hB.astype(dtype), geom.astype(dtype), mask,
                        w_geom.astype(dtype), W2.astype(dtype), b2.astype(dtype),
                        Wc1.astype(dtype), bc1.astype(dtype), wc2.astype(dtype),
                        tanh=True, tile=tile, version=version,
                    )
                    print(
                        f"pallas v{version} {dn} tile {tile:3d}:  {ms:7.2f} ms/layer-call",
                        flush=True,
                    )
                except Exception as e:
                    print(
                        f"pallas v{version} {dn} tile {tile}: FAILED {str(e)[:120]}",
                        flush=True,
                    )

    # v3 streaming kernel (egnn_stream.py): NOTE it does strictly MORE work
    # than the rows above — per-edge geometry + dataloader featurization run
    # in-kernel from O(N) node data, while xla/v1/v2 receive the [B,N,N,8]
    # geometry tensor precomputed (and untimed).
    from extending_the_n_body_benchmark_a_cross_model_study_of_geometric_deep_learning_architectures_tpu.ops.pallas.egnn_stream import (
        streaming_egnn_messages,
    )

    pos0 = mk(9, (B, N, 3), 1.0)
    vel = mk(10, (B, N, 3), 0.3)
    coordc = pos0 + mk(11, (B, N, 3), 0.05)
    massk = jnp.ones((B, N, 1), jnp.float32)
    for dtype, dn in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
        # ebf: run the [TI,TJ,He] elementwise stack (silus + mask multiply,
        # the kernel's dominant VPU volume) in bf16 for 2x packing
        for ebf in (False, True):
            en = " ebf16" if ebf else ""
            for ti in tiles:
                # tile_j only matters when N > tile_j (the wrapper clamps a
                # single sender tile to the padded N) — at the headline
                # N=100 every tj request is the same TJ=104 config, so run
                # one row per ti instead of three identical ones
                tjs = (104, 128, 256) if N > 104 else (104,)
                for tj in tjs:
                    try:
                        ms = bench(
                            streaming_egnn_messages,
                            hA.astype(dtype), hB.astype(dtype),
                            pos0, vel, massk, coordc, mask,
                            w_geom.astype(dtype), W2.astype(dtype),
                            b2.astype(dtype), Wc1.astype(dtype),
                            bc1.astype(dtype), wc2.astype(dtype),
                            tanh=True, norm_diff=True, tile_i=ti, tile_j=tj,
                            elem_bf16=ebf,
                        )
                        print(
                            f"pallas v3 {dn}{en} ti{ti:3d} tj{tj:3d}: "
                            f"{ms:7.2f} ms/layer-call "
                            "(incl. in-kernel featurize)",
                            flush=True,
                        )
                    except Exception as e:
                        print(
                            f"pallas v3 {dn}{en} ti{ti} tj{tj}: "
                            f"FAILED {str(e)[:120]}",
                            flush=True,
                        )


if __name__ == "__main__":
    main()
