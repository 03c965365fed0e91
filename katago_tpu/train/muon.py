"""Muon optimizer family in optax form — port of the reference's
python/muon/muon.py (muon_update muon.py:138, NS5 muon.py:23, Polar
Express muon.py:71, NorMuon row normalization muon.py:170-180).

Matrix-shaped parameters (ndim >= 2, conv kernels flattened to 2-D) get
orthogonalized-momentum updates; everything else (biases, norm scales)
falls back to AdamW, matching the reference's muon/adam param split.

TPU notes: the NS iteration is pure bf16 matmuls (MXU-friendly); the
reference's distributed flat-bucket all-gather machinery (muon.py:250-265)
has no equivalent here because under our data-parallel mesh parameters are
replicated and XLA shards the update computation — there is no manual
cross-device step at all.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

_NS5_COEFFS = (3.4445, -4.7750, 2.0315)

_POLAR_EXPRESS_COEFFS = [
    (8.28721201814563, -23.595886519098837, 17.300387312530933),
    (4.107059111542203, -2.9478499167379106, 0.5448431082926601),
    (3.9486908534822946, -2.908902115962949, 0.5518191394370137),
    (3.3184196573706015, -2.488488024314874, 0.51004894012372),
    (2.300652019954817, -1.6689039845747493, 0.4188073119525673),
    (1.891301407787398, -1.2679958271945868, 0.37680408948524835),
    (1.8750014808534479, -1.2500016453999487, 0.3750001645474248),
    (1.875, -1.25, 0.375),
]
_POLAR_EXPRESS_COEFFS = [
    (a / 1.01, b / 1.01 ** 3, c / 1.01 ** 5)
    for (a, b, c) in _POLAR_EXPRESS_COEFFS[:-1]
] + [_POLAR_EXPRESS_COEFFS[-1]]


def zeropower_newtonschulz5(g: jax.Array, steps: int = 5) -> jax.Array:
    """Quintic Newton-Schulz orthogonalization (muon.py:23-49): returns
    ~US'V^T with S' near identity. bf16 matmuls, f32 in/out."""
    transpose = g.shape[-2] > g.shape[-1]
    x = g.astype(jnp.bfloat16)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=(-2, -1),
                           keepdims=True)
    x = x / (norm.astype(jnp.bfloat16) + 1e-7)
    a, b, c = _NS5_COEFFS
    for _ in range(steps):
        xxt = x @ jnp.swapaxes(x, -1, -2)
        bmat = b * xxt + c * (xxt @ xxt)
        x = a * x + bmat @ x
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    return x.astype(jnp.float32)


def zeropower_polar_express(g: jax.Array, steps: int = 5) -> jax.Array:
    """Polar Express orthogonalization (muon.py:71-97, arXiv:2505.16932)."""
    transpose = g.shape[-2] > g.shape[-1]
    x = g.astype(jnp.bfloat16)
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=(-2, -1),
                           keepdims=True)
    x = x / (norm.astype(jnp.bfloat16) * 1.01 + 1e-7)
    coeffs = list(_POLAR_EXPRESS_COEFFS[:steps])
    while len(coeffs) < steps:
        coeffs.append(_POLAR_EXPRESS_COEFFS[-1])
    for a, b, c in coeffs:
        xxt = x @ jnp.swapaxes(x, -1, -2)
        bmat = b * xxt + c * (xxt @ xxt)
        x = a * x + bmat @ x
    if transpose:
        x = jnp.swapaxes(x, -1, -2)
    return x.astype(jnp.float32)


class MuonState(NamedTuple):
    momentum: optax.Updates
    normuon_v: optax.Updates


def _as_matrix(p: jax.Array) -> jax.Array:
    """Flatten a >=2-D parameter to [fan_in, fan_out]: flax convs
    [kh,kw,cin,cout] and dense kernels [cin,cout] alike. (Transpose of the
    torch view(len,-1); the orthogonalization and RMS-matching scale are
    transpose-symmetric.)"""
    return p.reshape(-1, p.shape[-1])


def is_muon_param(p) -> bool:
    """Matrix-like params take the Muon path (reference param split)."""
    m = _as_matrix(p) if p.ndim >= 2 else p
    return p.ndim >= 2 and m.shape[0] > 1 and m.shape[1] > 1


def scale_by_muon(beta: float = 0.95, ns_steps: int = 5,
                  nesterov: bool = True, use_polar_express: bool = False,
                  normuon: bool = False, normuon_beta2: float = 0.95,
                  normuon_eps: float = 1e-8) -> optax.GradientTransformation:
    """Muon direction for matrix params (sign convention: a *descent step
    pre-multiplier*, chain with optax.scale_by_learning_rate)."""
    orth = zeropower_polar_express if use_polar_express \
        else zeropower_newtonschulz5
    rms_scale = 0.1825 if use_polar_express else 0.2

    def init(params):
        return MuonState(
            momentum=jax.tree.map(jnp.zeros_like, params),
            normuon_v=jax.tree.map(
                lambda p: jnp.zeros((_as_matrix(p).shape[0],), jnp.float32),
                params))

    def update(grads, state, params=None):
        del params

        def one(g, m, v):
            new_m = m * beta + g * (1.0 - beta)
            upd = g * (1.0 - beta) + new_m * beta if nesterov else new_m
            mat = _as_matrix(upd)
            o = orth(mat, ns_steps)
            if normuon:
                new_v = v * normuon_beta2 + jnp.mean(
                    jnp.square(o), axis=-1) * (1.0 - normuon_beta2)
                o = o / (jnp.sqrt(new_v)[:, None] + normuon_eps)
                mn = o.shape[0] * o.shape[1]
                o = o * (0.1825 * jnp.sqrt(float(mn)) /
                         (jnp.linalg.norm(o) + 1e-30))
            else:
                new_v = v
                o = o * (rms_scale * max(mat.shape[0], mat.shape[1]) ** 0.5)
            return o.reshape(g.shape), new_m, new_v

        mapped = jax.tree.map(one, grads, state.momentum, state.normuon_v)
        leaves, treedef = jax.tree.flatten(
            mapped, is_leaf=lambda x: isinstance(x, tuple) and len(x) == 3
            and isinstance(x[0], jax.Array))
        upds = treedef.unflatten([t[0] for t in leaves])
        new_m = treedef.unflatten([t[1] for t in leaves])
        new_v = treedef.unflatten([t[2] for t in leaves])
        return upds, MuonState(momentum=new_m, normuon_v=new_v)

    return optax.GradientTransformation(init, update)


def muon(learning_rate, *, beta: float = 0.95, ns_steps: int = 5,
         nesterov: bool = True, use_polar_express: bool = False,
         normuon: bool = False, weight_decay: float = 0.0,
         adam_lr_ratio: float = 1.0, adam_b1: float = 0.9,
         adam_b2: float = 0.95,
         adam_eps: float = 1e-10) -> optax.GradientTransformation:
    """Full optimizer: Muon for matrix params, AdamW for the rest."""
    muon_chain = optax.chain(
        scale_by_muon(beta=beta, ns_steps=ns_steps, nesterov=nesterov,
                      use_polar_express=use_polar_express, normuon=normuon),
        optax.add_decayed_weights(weight_decay) if weight_decay
        else optax.identity(),
        optax.scale_by_learning_rate(learning_rate),
    )
    adam_lr = (lambda c: adam_lr_ratio * learning_rate(c)) \
        if callable(learning_rate) else adam_lr_ratio * learning_rate
    adam_chain = optax.adamw(adam_lr, b1=adam_b1, b2=adam_b2, eps=adam_eps,
                             weight_decay=weight_decay)

    def label_fn(params):
        return jax.tree.map(
            lambda p: "muon" if is_muon_param(p) else "adam", params)

    return optax.multi_transform({"muon": muon_chain, "adam": adam_chain},
                                 label_fn)
