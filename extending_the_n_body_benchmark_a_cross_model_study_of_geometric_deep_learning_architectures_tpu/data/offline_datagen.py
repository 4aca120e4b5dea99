"""Offline charged-systems datagen: isolated balls + rigid sticks + hinges.

TPU-native re-design of ``datasets/nbody_offline/datagen/`` (``System`` +
``Isolated``/``Stick``/``Hinge`` physical objects + joblib driver).  The
constrained rigid-body dynamics are vectorised over objects (vmapped
analytic updates instead of per-object Python), the Euler loop is a
``lax.scan``, and the batch of simulations is one ``vmap`` — replacing
``joblib.Parallel`` workers (``generate_dataset.py:74``).

Semantics preserved (file:line into datasets/nbody_offline/datagen/):
* Coulomb ``q_i q_j / r^3`` forces, per-component cap 0.1/dt
  (``system.py:85-114``)
* density-scaled ``loc_std * (N/5)^(1/3) + 0.1`` init (``system.py:22``)
* stick: shared CoM frame, angular-velocity integration by Rodrigues
  rotation (``physical_objects.py:64-133``)
* hinge: pivot node 0 with two constrained beams, 3x3 solve for the pivot
  acceleration (``physical_objects.py:148-226``)
* frame saved when ``t % sample_freq == 0`` with t starting at 0 *after*
  the first step (``generate_dataset.py:57-63``)

Object-to-node assignment uses contiguous blocks
``[isolated... | stick pairs... | hinge triples...]`` instead of the
reference's random index draw — distributionally identical (node labels
only enter through exchangeable charges) and gather-free.

Output files match the reference layout: ``{loc,vel,edges,charges}_{split}_
charged<I>_<S>_<H><suffix>.npy`` + ``cfg_*.pkl``.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class OfflineParams(NamedTuple):
    delta_t: float = 0.001
    loc_std: float = 1.0
    vel_norm: float = 0.5
    interaction_strength: float = 1.0


def _rodrigues(theta, axis):
    """Axis-angle rotation matrix (``physical_objects.py:10-24``)."""
    x, y, z = axis[0], axis[1], axis[2]
    c, s = jnp.cos(theta), jnp.sin(theta)
    C = 1 - c
    return jnp.array(
        [
            [c + C * x * x, C * x * y - s * z, C * x * z + s * y],
            [C * x * y + s * z, c + C * y * y, C * y * z - s * x],
            [C * x * z - s * y, C * y * z + s * x, c + C * z * z],
        ]
    )


def _proj(va, vb):
    return jnp.dot(va, vb) / jnp.dot(vb, vb) * vb


# ------------------------------------------------------------ object updates


def _stick_init(x, v):
    """x, v [2, 3] -> adjusted v + (xc, vc, wc, length)."""
    d = x[1] - x[0]
    pro = jnp.stack([_proj(v[0], d), _proj(v[1], d)])
    vert = v - pro
    avg = pro.mean(axis=0)
    v = vert + avg
    xc = x.mean(axis=0)
    vc = v.mean(axis=0)
    r0 = x[0] - xc
    wc = jnp.cross(r0, v[0] - vc) / jnp.dot(r0, r0)
    return v, (xc, vc, wc)


def _stick_update(x, v, f, state, dt):
    xc, vc, wc = state
    r = x - xc  # [2, 3]
    ac = f.mean(axis=0)
    vc = vc + ac * dt
    xc = xc + vc * dt
    J = jnp.sum(jnp.einsum("ni,ni->n", r, r))
    M = jnp.cross(r[0], f[0]) + jnp.cross(r[1], f[1])
    wc = wc + (M / J) * dt
    w_norm = jnp.sqrt(jnp.dot(wc, wc) + 1e-30)
    R = _rodrigues(w_norm * dt, wc / w_norm)
    r_new = r @ R.T
    x_new = xc + r_new
    v_new = vc + jnp.cross(jnp.broadcast_to(wc, r_new.shape), r_new)
    return x_new, v_new, (xc, vc, wc)


def _hinge_init(x, v):
    d1, d2 = x[1] - x[0], x[2] - x[0]
    v1 = _proj(v[0], d1) + (v[1] - _proj(v[1], d1))
    v2 = _proj(v[0], d2) + (v[2] - _proj(v[2], d2))
    w1 = jnp.cross(d1, v1 - v[0]) / jnp.dot(d1, d1)
    w2 = jnp.cross(d2, v2 - v[0]) / jnp.dot(d2, d2)
    return jnp.stack([v[0], v1, v2]), (w1, w2)


def _hinge_update(x, v, f, state, dt):
    w1, w2 = state
    r01, r02 = x[1] - x[0], x[2] - x[0]
    v01, v02 = v[1] - v[0], v[2] - v[0]
    e01 = r01 / jnp.sqrt(jnp.dot(r01, r01))
    e02 = r02 / jnp.sqrt(jnp.dot(r02, r02))
    P1 = jnp.outer(e01, e01)
    P2 = jnp.outer(e02, e02)
    A = jnp.eye(3) + P1 + P2
    a = f.sum(axis=0) - jnp.cross(w1, v01) - jnp.cross(w2, v02)
    a = a - (jnp.eye(3) - P1) @ f[1] - (jnp.eye(3) - P2) @ f[2]
    a0 = jnp.linalg.solve(A, a)

    v0 = v[0] + a0 * dt
    x0 = x[0] + v0 * dt

    w1 = w1 + jnp.cross(r01, f[1] - a0) / jnp.dot(r01, r01) * dt
    w2 = w2 + jnp.cross(r02, f[2] - a0) / jnp.dot(r02, r02) * dt

    n1 = jnp.sqrt(jnp.dot(w1, w1) + 1e-30)
    n2 = jnp.sqrt(jnp.dot(w2, w2) + 1e-30)
    r01n = _rodrigues(n1 * dt, w1 / n1) @ r01
    r02n = _rodrigues(n2 * dt, w2 / n2) @ r02
    x1, x2 = x0 + r01n, x0 + r02n
    v1, v2 = v0 + jnp.cross(w1, r01n), v0 + jnp.cross(w2, r02n)
    return jnp.stack([x0, x1, x2]), jnp.stack([v0, v1, v2]), (w1, w2)


# ----------------------------------------------------------------- system


@functools.partial(
    jax.jit,
    static_argnames=("n_isolated", "n_stick", "n_hinge", "T", "sample_freq", "params"),
)
def simulate_system(
    key,
    n_isolated: int,
    n_stick: int,
    n_hinge: int,
    T: int = 5000,
    sample_freq: int = 100,
    params: OfflineParams = OfflineParams(),
):
    """One constrained system; returns ``(loc [T//freq, N, 3], vel, edges,
    charges)``.  Node blocks: isolated | sticks (pairs) | hinges (triples)."""
    n = n_isolated + 2 * n_stick + 3 * n_hinge
    dt = params.delta_t
    max_f = 0.1 / dt
    k_c, k_x, k_v = jax.random.split(key, 3)

    charges = jnp.where(
        jax.random.bernoulli(k_c, 0.5, (n, 1)), 1.0, -1.0
    )
    edges = charges @ charges.T
    loc_std = params.loc_std * (n / 5.0) ** (1.0 / 3.0) + 0.1
    X = jax.random.normal(k_x, (n, 3)) * loc_std
    V = jax.random.normal(k_v, (n, 3))
    V = V / jnp.linalg.norm(V, axis=-1, keepdims=True) * params.vel_norm

    iso_sl = slice(0, n_isolated)
    stick_sl = slice(n_isolated, n_isolated + 2 * n_stick)
    hinge_sl = slice(n_isolated + 2 * n_stick, n)

    # constraint-consistent initial velocities + per-object state
    stick_state = (jnp.zeros((n_stick, 3)),) * 3
    if n_stick:
        xs = X[stick_sl].reshape(n_stick, 2, 3)
        vs = V[stick_sl].reshape(n_stick, 2, 3)
        vs_new, stick_state = jax.vmap(_stick_init)(xs, vs)
        V = V.at[stick_sl].set(vs_new.reshape(-1, 3))
    hinge_state = (jnp.zeros((n_hinge, 3)),) * 2
    if n_hinge:
        xh = X[hinge_sl].reshape(n_hinge, 3, 3)
        vh = V[hinge_sl].reshape(n_hinge, 3, 3)
        vh_new, hinge_state = jax.vmap(_hinge_init)(xh, vh)
        V = V.at[hinge_sl].set(vh_new.reshape(-1, 3))

    def forces(X):
        rel = X[:, None, :] - X[None, :, :]
        r2 = jnp.sum(rel * rel, axis=-1)
        inv_r3 = jnp.where(r2 > 0, jnp.where(r2 > 0, r2, 1.0) ** -1.5, 0.0)
        fs = params.interaction_strength * edges * inv_r3 * (1.0 - jnp.eye(n))
        return jnp.clip(jnp.sum(fs[..., None] * rel, axis=1), -max_f, max_f)

    def one_step(carry):
        X, V, stick_state, hinge_state = carry
        F = forces(X)
        if n_isolated:
            a = F[iso_sl]
            v_new = V[iso_sl] + a * dt
            V = V.at[iso_sl].set(v_new)
            X = X.at[iso_sl].set(X[iso_sl] + v_new * dt)
        if n_stick:
            xs = X[stick_sl].reshape(n_stick, 2, 3)
            vs = V[stick_sl].reshape(n_stick, 2, 3)
            fs = F[stick_sl].reshape(n_stick, 2, 3)
            xs, vs, stick_state = jax.vmap(_stick_update, in_axes=(0, 0, 0, 0, None))(
                xs, vs, fs, stick_state, dt
            )
            X = X.at[stick_sl].set(xs.reshape(-1, 3))
            V = V.at[stick_sl].set(vs.reshape(-1, 3))
        if n_hinge:
            xh = X[hinge_sl].reshape(n_hinge, 3, 3)
            vh = V[hinge_sl].reshape(n_hinge, 3, 3)
            fh = F[hinge_sl].reshape(n_hinge, 3, 3)
            xh, vh, hinge_state = jax.vmap(_hinge_update, in_axes=(0, 0, 0, 0, None))(
                xh, vh, fh, hinge_state, dt
            )
            X = X.at[hinge_sl].set(xh.reshape(-1, 3))
            V = V.at[hinge_sl].set(vh.reshape(-1, 3))
        return (X, V, stick_state, hinge_state)

    def block(carry, _):
        # save after the first step of each block (t % freq == 0 with the
        # step at t executed first, generate_dataset.py:57-63)
        carry = one_step(carry)
        frame = (carry[0], carry[1])

        def sub(c, _):
            return one_step(c), None

        carry, _ = jax.lax.scan(sub, carry, None, length=sample_freq - 1)
        return carry, frame

    carry = (X, V, stick_state, hinge_state)
    _, (locs, vels) = jax.lax.scan(block, carry, None, length=T // sample_freq)
    return locs, vels, edges, charges


def generate_offline_dataset(
    path: str,
    n_isolated: int = 5,
    n_stick: int = 0,
    n_hinge: int = 0,
    num_train: int = 100,
    num_valid: int = 20,
    num_test: int = 20,
    length: int = 5000,
    length_test: int = 5000,
    sample_freq: int = 100,
    seed: int = 42,
    suffix: str = "",
    params: OfflineParams = OfflineParams(),
) -> str:
    """Write the reference-layout npy/pkl dataset files; returns the suffix."""
    os.makedirs(path, exist_ok=True)
    tag = f"_charged{n_isolated}_{n_stick}_{n_hinge}{suffix}"
    key = jax.random.PRNGKey(seed)

    def gen(key, n_sims, T):
        keys = jax.random.split(key, n_sims)
        loc, vel, edges, charges = jax.vmap(
            lambda k: simulate_system(
                k, n_isolated, n_stick, n_hinge, T, sample_freq, params
            )
        )(keys)
        return (
            np.asarray(loc),
            np.asarray(vel),
            np.asarray(edges),
            np.asarray(charges),
        )

    cfg_entry = {}
    idx = 0
    if n_isolated:
        cfg_entry["Isolated"] = [[i] for i in range(n_isolated)]
        idx = n_isolated
    if n_stick:
        cfg_entry["Stick"] = [[idx + 2 * s, idx + 2 * s + 1] for s in range(n_stick)]
        idx += 2 * n_stick
    if n_hinge:
        cfg_entry["Hinge"] = [
            [idx + 3 * h, idx + 3 * h + 1, idx + 3 * h + 2] for h in range(n_hinge)
        ]

    k1, k2, k3 = jax.random.split(key, 3)
    for split, k, n_sims, T in [
        ("train", k1, num_train, length),
        ("valid", k2, num_valid, length),
        ("test", k3, num_test, length_test),
    ]:
        loc, vel, edges, charges = gen(k, n_sims, T)
        np.save(os.path.join(path, f"loc_{split}{tag}.npy"), loc)
        np.save(os.path.join(path, f"vel_{split}{tag}.npy"), vel)
        np.save(os.path.join(path, f"edges_{split}{tag}.npy"), edges)
        np.save(os.path.join(path, f"charges_{split}{tag}.npy"), charges)
        with open(os.path.join(path, f"cfg_{split}{tag}.pkl"), "wb") as f:
            pickle.dump([cfg_entry] * n_sims, f)
    return tag


def main(argv=None):  # pragma: no cover - thin CLI
    import argparse

    p = argparse.ArgumentParser(description="Generate offline charged dataset")
    p.add_argument("--path", default="datasets_offline/data")
    p.add_argument("--num-train", type=int, default=100)
    p.add_argument("--num-valid", type=int, default=20)
    p.add_argument("--num-test", type=int, default=20)
    p.add_argument("--length", type=int, default=5000)
    p.add_argument("--length_test", type=int, default=5000)
    p.add_argument("--sample-freq", type=int, default=100)
    p.add_argument("--n_isolated", type=int, default=5)
    p.add_argument("--n_stick", type=int, default=0)
    p.add_argument("--n_hinge", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--suffix", default="")
    a = p.parse_args(argv)
    tag = generate_offline_dataset(
        a.path, a.n_isolated, a.n_stick, a.n_hinge, a.num_train, a.num_valid,
        a.num_test, a.length, a.length_test, a.sample_freq, a.seed, a.suffix,
    )
    print(f"wrote dataset {tag} to {a.path}")


if __name__ == "__main__":  # pragma: no cover
    main()
