"""Steerable (O(3)-equivariant) linear algebra from scratch — no e3nn.

Replaces the reference's third-party e3nn dependency (SURVEY.md §2 language
note) for SEGNN (``models/segnn/o3_building_blocks.py``) and EquiformerV2:

* :class:`Irreps` — a minimal irreps container ("48x0e+48x1o" strings).
* :func:`spherical_harmonics` — real SH up to lmax=2, e3nn component order
  (l=1 -> (y, z, x)) and 'integral' normalization with unit-normalised input
  (matching ``O3Transform``'s calls, ``o3_building_blocks.py:243-270``).
* :func:`wigner_D` / :func:`clebsch_gordan` — computed *numerically* at
  import: D^l is solved from Y(Rv) = D Y(v) on sample points; CG tensors are
  the (1-dimensional) null space of the equivariance constraint over random
  rotations.  Cached; f64 on host, used as constants in jitted code.
* :class:`SteerableTensorProduct` — the role of e3nn
  ``FullyConnectedTensorProduct`` + the SEGNN rescale/bias wrapper
  (``o3_building_blocks.py:10-167``): per-path weights with torch-Linear
  style ``U(+-1/sqrt(fan_in))`` init (the *net* effect of e3nn's component
  normalization followed by SEGNN's ``sqrt_k`` rescale), biases on scalar
  outputs.
* :class:`GateActivation` — e3nn ``Gate`` semantics: SiLU on scalars,
  sigmoid-gated higher-l irreps (``o3_building_blocks.py:186-195``).

Everything operates on flat ``[..., irreps.dim]`` feature axes, fully
batched — TPU-friendly dense einsums, no per-edge Python.
"""

from __future__ import annotations

import functools
import math
import re
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# --------------------------------------------------------------------- irreps


class Irreps:
    """List of ``(mul, (l, parity))`` with e3nn-style string syntax."""

    def __init__(self, spec):
        if isinstance(spec, Irreps):
            self.items = list(spec.items)
        elif isinstance(spec, str):
            self.items = []
            for part in spec.replace(" ", "").split("+"):
                if not part:
                    continue
                m = re.fullmatch(r"(?:(\d+)x)?(\d+)([eo])", part)
                if not m:
                    raise ValueError(f"Bad irrep spec: {part}")
                mul = int(m.group(1) or 1)
                l = int(m.group(2))
                p = 1 if m.group(3) == "e" else -1
                if mul > 0:
                    self.items.append((mul, (l, p)))
        else:
            self.items = [(int(mul), (int(l), int(p))) for mul, (l, p) in spec]

    @staticmethod
    def spherical_harmonics(lmax: int) -> "Irreps":
        return Irreps([(1, (l, (-1) ** l)) for l in range(lmax + 1)])

    @property
    def dim(self) -> int:
        return sum(mul * (2 * l + 1) for mul, (l, _) in self.items)

    @property
    def num_irreps(self) -> int:
        return sum(mul for mul, _ in self.items)

    @property
    def lmax(self) -> int:
        return max(l for _, (l, _) in self.items)

    def slices(self) -> List[slice]:
        out, start = [], 0
        for mul, (l, _) in self.items:
            d = mul * (2 * l + 1)
            out.append(slice(start, start + d))
            start += d
        return out

    def simplify(self) -> "Irreps":
        merged: List[Tuple[int, Tuple[int, int]]] = []
        for mul, ir in self.items:
            if merged and merged[-1][1] == ir:
                merged[-1] = (merged[-1][0] + mul, ir)
            else:
                merged.append((mul, ir))
        return Irreps(merged)

    def sort(self) -> "Irreps":
        return Irreps(sorted(self.items, key=lambda t: (t[1][0], -t[1][1])))

    def __add__(self, other) -> "Irreps":
        return Irreps(self.items + Irreps(other).items)

    def __mul__(self, n: int) -> "Irreps":
        return Irreps([(mul * n, ir) for mul, ir in self.items])

    __rmul__ = __mul__

    def __iter__(self):
        return iter(self.items)

    def __eq__(self, other):
        return isinstance(other, Irreps) and self.items == other.items

    def __hash__(self):
        return hash(tuple(self.items))

    def __repr__(self):
        return "+".join(
            f"{mul}x{l}{'e' if p > 0 else 'o'}" for mul, (l, p) in self.items
        )


# ------------------------------------------------- real spherical harmonics

_SH_NORM = {
    0: 0.5 / math.sqrt(math.pi),  # 1/sqrt(4 pi)
    1: math.sqrt(3.0 / (4.0 * math.pi)),
}


def _sh_l2(x, y, z):
    """l=2 real SH (integral norm) in e3nn order (m = -2..2)."""
    c = math.sqrt(15.0 / math.pi)
    return [
        0.5 * c * x * y,
        0.5 * c * y * z,
        0.25 * math.sqrt(5.0 / math.pi) * (3.0 * z * z - 1.0),
        0.5 * c * z * x,
        0.25 * c * (x * x - y * y),
    ]


def spherical_harmonics(
    lmax: int, vec: jnp.ndarray, normalize: bool = True, eps: float = 1e-8
) -> jnp.ndarray:
    """Real SH of ``vec [..., 3]`` for all l<=lmax, concatenated (dim (lmax+1)^2).

    e3nn conventions: component order l=1 -> (y, z, x); 'integral'
    normalization; input unit-normalised when ``normalize=True`` (zero vectors
    map to zero for l>=1 — they only ever occur on the masked diagonal).
    """
    if lmax > 2:
        raise NotImplementedError("lmax <= 2 supported (reference uses <= 2)")
    if normalize:
        sq = jnp.sum(vec * vec, axis=-1, keepdims=True)
        good = sq > eps * eps
        vec = jnp.where(good, vec / jnp.sqrt(jnp.where(good, sq, 1.0)), 0.0)
    x, y, z = vec[..., 0], vec[..., 1], vec[..., 2]
    comps = [jnp.full(x.shape, _SH_NORM[0], vec.dtype)]
    if lmax >= 1:
        comps += [_SH_NORM[1] * y, _SH_NORM[1] * z, _SH_NORM[1] * x]
    if lmax >= 2:
        comps += _sh_l2(x, y, z)
    return jnp.stack(comps, axis=-1)


# ------------------------------------------------------- wigner D / CG (f64)


def _sh_numpy(l: int, v: np.ndarray) -> np.ndarray:
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    if l == 0:
        return np.full(x.shape + (1,), _SH_NORM[0])
    if l == 1:
        return np.stack([_SH_NORM[1] * y, _SH_NORM[1] * z, _SH_NORM[1] * x], -1)
    if l == 2:
        return np.stack(_sh_l2(x, y, z), -1)
    raise NotImplementedError


@functools.lru_cache(maxsize=None)
def _sample_points() -> np.ndarray:
    rng = np.random.default_rng(12345)
    v = rng.normal(size=(64, 3))
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def wigner_D_numpy(l: int, R: np.ndarray) -> np.ndarray:
    """D^l(R) in the real-SH basis: Y_l(R v) = D^l(R) Y_l(v)."""
    if l == 0:
        return np.ones((1, 1))
    V = _sample_points()
    Y0 = _sh_numpy(l, V)  # [K, 2l+1]
    Y1 = _sh_numpy(l, V @ R.T)
    D_T, *_ = np.linalg.lstsq(Y0, Y1, rcond=None)
    return D_T.T


@functools.lru_cache(maxsize=None)
def clebsch_gordan(l1: int, l2: int, l3: int) -> np.ndarray:
    """CG tensor ``C [2l3+1, 2l1+1, 2l2+1]`` with ||C||_F = 1, real-SH basis.

    Solved as the null space of the equivariance constraint
    ``D3(R) C = C (D1(R) (x) D2(R))`` over random rotations (unique up to
    sign for valid (l1, l2, l3); deterministic sign fix).
    """
    if not abs(l1 - l2) <= l3 <= l1 + l2:
        raise ValueError(f"No CG path {l1}x{l2}->{l3}")
    d1, d2, d3 = 2 * l1 + 1, 2 * l2 + 1, 2 * l3 + 1
    rng = np.random.default_rng(l1 * 100 + l2 * 10 + l3)
    rows = []
    for _ in range(8):
        A = rng.normal(size=(3, 3))
        Q, r = np.linalg.qr(A)
        R = Q * np.sign(np.diag(r))
        if np.linalg.det(R) < 0:
            R[:, 0] *= -1
        D1, D2, D3 = (wigner_D_numpy(l, R) for l in (l1, l2, l3))
        # Row-major vec: vec(D3 C) = (D3 (x) I) vec(C);
        #                vec(C K12) = (I (x) K12^T) vec(C).
        K12 = np.kron(D1, D2)
        M = np.kron(D3, np.eye(d1 * d2)) - np.kron(np.eye(d3), K12.T)
        rows.append(M)
    M = np.concatenate(rows, axis=0)
    _, s, vh = np.linalg.svd(M)
    null = vh[-1]
    if s[-1] > 1e-8:
        raise RuntimeError(f"No CG null space for {l1}x{l2}->{l3}")
    C = null.reshape(d3, d1, d2)
    C /= np.linalg.norm(C)
    flat = C.reshape(-1)
    nz = flat[np.abs(flat) > 1e-6]
    if nz.size and nz[0] < 0:
        C = -C
    return C


# --------------------------------------------------------- tensor product


def tp_paths(
    irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps
) -> List[Tuple[int, int, int]]:
    """Valid (i1, i2, iout) index triples (selection rules incl. parity)."""
    paths = []
    for a, (m1, (l1, p1)) in enumerate(irreps_in1):
        for b, (m2, (l2, p2)) in enumerate(irreps_in2):
            for c, (m3, (l3, p3)) in enumerate(irreps_out):
                if abs(l1 - l2) <= l3 <= l1 + l2 and p1 * p2 == p3:
                    paths.append((a, b, c))
    return paths


def tp_weight_numel(irreps_in1: Irreps, irreps_in2: Irreps, irreps_out: Irreps) -> int:
    """Weight count of the fully-connected TP (``FullyConnectedTensorProduct
    .weight_numel`` equivalent, used by WeightBalancedIrreps)."""
    n = 0
    for a, b, c in tp_paths(irreps_in1, irreps_in2, irreps_out):
        n += irreps_in1.items[a][0] * irreps_in2.items[b][0] * irreps_out.items[c][0]
    return n


def weight_balanced_irreps(
    scalar_features: int, irreps_in2: Irreps, lmax: int
) -> Irreps:
    """``WeightBalancedIrreps`` (``models/balanced_irreps.py:51-85``): smallest
    n such that TP(n x sh(lmax), in2 -> same) has at least as many weights as
    Linear(scalar_features -> scalar_features)."""
    target = tp_weight_numel(
        Irreps(f"{scalar_features}x0e"), Irreps("1x0e"), Irreps(f"{scalar_features}x0e")
    )
    n = 1
    while True:
        cand = (Irreps.spherical_harmonics(lmax) * n).sort().simplify()
        if tp_weight_numel(cand, irreps_in2, cand) >= target:
            return cand
        n += 1


class SteerableTensorProduct(nn.Module):
    """Fully-connected steerable bilinear layer with torch-Linear-like init.

    ``out = sum_paths w[u,v,w'] * sqrt(2 l3 + 1) * C^{l3}_{l1 l2} x1 x2 + b``

    The ``sqrt(2l3+1)`` path factor with ``||C||=1`` is e3nn's 'component'
    normalization; weights init ``U(+-1/sqrt(fan_in))`` with
    ``fan_in = sum_paths mul1*mul2`` reproduces the reference's rescaled TP
    (``o3_building_blocks.py:82-117``).  Biases only on scalar (l=0) outputs.
    ``irreps_in2=None`` degenerates to a plain steerable linear layer
    (second input == scalar 1), like ``O3TensorProduct`` with no attributes.
    """

    irreps_in1: Irreps
    irreps_out: Irreps
    irreps_in2: Optional[Irreps] = None

    @nn.compact
    def __call__(self, x1: jnp.ndarray, x2: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        ir1 = Irreps(self.irreps_in1)
        ir2 = Irreps(self.irreps_in2) if self.irreps_in2 is not None else Irreps("1x0e")
        ir3 = Irreps(self.irreps_out)
        if x2 is None:
            # trivial scalar second input == 1/sh-norm so the path is identity-ish;
            # the reference uses ones (o3_building_blocks.py:151-152)
            x2 = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)

        s1, s2, s3 = ir1.slices(), ir2.slices(), ir3.slices()
        paths = tp_paths(ir1, ir2, ir3)
        if not paths:
            raise ValueError(f"No TP paths {ir1} x {ir2} -> {ir3}")

        fan_in: Dict[int, int] = {}
        for a, b, c in paths:
            fan_in[c] = fan_in.get(c, 0) + ir1.items[a][0] * ir2.items[b][0]

        out_chunks = {c: [] for c in range(len(ir3.items))}
        for a, b, c in paths:
            m1, (l1, _) = ir1.items[a]
            m2, (l2, _) = ir2.items[b]
            m3, (l3, _) = ir3.items[c]
            C = jnp.asarray(clebsch_gordan(l1, l2, l3), x1.dtype)
            alpha = math.sqrt(2 * l3 + 1)
            bound = 1.0 / math.sqrt(fan_in[c])
            w = self.param(
                f"w_{a}_{b}_{c}",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (m1, m2, m3),
            ).astype(x1.dtype)
            xa = x1[..., s1[a]].reshape(x1.shape[:-1] + (m1, 2 * l1 + 1))
            xb = x2[..., s2[b]].reshape(x2.shape[:-1] + (m2, 2 * l2 + 1))
            # [..., m3, 2l3+1]
            out = alpha * jnp.einsum("kij,...ui,...vj,uvw->...wk", C, xa, xb, w)
            out_chunks[c].append(out)

        pieces = []
        for c, (m3, (l3, _)) in enumerate(ir3.items):
            if out_chunks[c]:
                total = sum(out_chunks[c])
            else:
                total = jnp.zeros(x1.shape[:-1] + (m3, 2 * l3 + 1), x1.dtype)
            if l3 == 0:
                bound = 1.0 / math.sqrt(fan_in.get(c, 1))
                b = self.param(
                    f"b_{c}",
                    lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                    (m3,),
                ).astype(x1.dtype)
                total = total + b[..., :, None]
            pieces.append(total.reshape(total.shape[:-2] + (m3 * (2 * l3 + 1),)))
        return jnp.concatenate(pieces, axis=-1)


def gate_irreps(irreps_out: Irreps) -> Irreps:
    """Pre-gate irreps for ``O3TensorProductSwishGate``
    (``o3_building_blocks.py:170-185``): scalars + one 0e gate per
    non-scalar irrep + the gated irreps."""
    items = list(Irreps(irreps_out).items)
    scalars = Irreps([items[0]])
    gated = Irreps(items[1:])
    n_gates = gated.num_irreps
    if n_gates == 0:
        return Irreps(items)
    return (scalars + Irreps(f"{n_gates}x0e") + gated).simplify()


class GateActivation(nn.Module):
    """e3nn ``Gate``: SiLU on leading scalars, sigmoid(gate) * gated irreps."""

    irreps_out: Irreps  # the post-gate irreps

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ir = Irreps(self.irreps_out)
        items = list(ir.items)
        n_scalars = items[0][0]
        gated = Irreps(items[1:])
        n_gates = gated.num_irreps
        if n_gates == 0:
            return jax.nn.silu(x)
        scalars = jax.nn.silu(x[..., :n_scalars])
        gates = jax.nn.sigmoid(x[..., n_scalars : n_scalars + n_gates])
        rest = x[..., n_scalars + n_gates :]
        pieces, g_idx, start = [], 0, 0
        for mul, (l, _) in gated:
            d = mul * (2 * l + 1)
            seg = rest[..., start : start + d].reshape(rest.shape[:-1] + (mul, 2 * l + 1))
            g = gates[..., g_idx : g_idx + mul]
            pieces.append((seg * g[..., :, None]).reshape(rest.shape[:-1] + (d,)))
            start += d
            g_idx += mul
        return jnp.concatenate([scalars] + pieces, axis=-1)


class SteerableInstanceNorm(nn.Module):
    """Per-graph instance norm over irreps (``models/segnn/instance_norm.py:
    8-129``), dense formulation: input ``[B, N, irreps.dim]`` where each
    batch element is one simulation graph.

    Scalars are mean-centred per graph; every irrep channel is divided by
    the graph-reduced component norm; learnable per-channel weight and
    per-scalar bias ('component' normalization, 'mean' reduce).
    """

    irreps: Irreps
    eps: float = 1e-5
    affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        ir = Irreps(self.irreps)
        num_features = ir.num_irreps
        num_scalar = sum(mul for mul, (l, _) in ir if l == 0)
        if self.affine:
            weight = self.param("weight", nn.initializers.ones, (num_features,))
            bias = self.param("bias", nn.initializers.zeros, (num_scalar,))
        pieces, iw, ib = [], 0, 0
        for sl, (mul, (l, _)) in zip(ir.slices(), ir):
            d = 2 * l + 1
            field = x[..., sl].reshape(x.shape[:-1] + (mul, d))
            if l == 0:
                field = field - jnp.mean(field, axis=1, keepdims=True)
            norm = jnp.mean(field * field, axis=-1)  # component normalization
            norm = jnp.mean(norm, axis=1, keepdims=True)  # per-graph reduce
            scale = (norm + self.eps) ** -0.5  # [B, 1, mul]
            if self.affine:
                scale = scale * weight[iw : iw + mul].astype(x.dtype)
                iw += mul
            field = field * scale[..., None]
            if self.affine and l == 0:
                field = field + bias[ib : ib + mul].astype(x.dtype)[..., :, None]
                ib += mul
            pieces.append(field.reshape(x.shape[:-1] + (mul * d,)))
        return jnp.concatenate(pieces, axis=-1)


class SteerableTPSwishGate(nn.Module):
    """``O3TensorProductSwishGate``: TP into gate irreps, then Gate."""

    irreps_in1: Irreps
    irreps_out: Irreps
    irreps_in2: Optional[Irreps] = None

    @nn.compact
    def __call__(self, x1, x2=None):
        pre = gate_irreps(self.irreps_out)
        h = SteerableTensorProduct(self.irreps_in1, pre, self.irreps_in2)(x1, x2)
        return GateActivation(self.irreps_out)(h)
