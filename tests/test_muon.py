"""Muon optimizer tests (reference python/muon/muon.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from katago_tpu.train.muon import (is_muon_param, muon,
                                   zeropower_newtonschulz5,
                                   zeropower_polar_express)


def test_ns5_orthogonalizes():
    g = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
    o = zeropower_newtonschulz5(g, 5)
    s = np.linalg.svd(np.asarray(o, np.float32), compute_uv=False)
    # NS5 converges to S' ~ Uniform(0.5, 1.5)-ish (muon.py:23 docstring)
    assert s.min() > 0.3 and s.max() < 1.7
    # preserves the row/col space: O^T G is near-symmetric-positive
    m = np.asarray(o, np.float32).T @ np.asarray(g, np.float32)
    assert np.linalg.eigvalsh((m + m.T) / 2).min() > -1e-2


def test_polar_express_tighter():
    g = jax.random.normal(jax.random.PRNGKey(1), (48, 48))
    o = zeropower_polar_express(g, 6)
    s = np.linalg.svd(np.asarray(o, np.float32), compute_uv=False)
    assert s.min() > 0.9 and s.max() < 1.1


def test_tall_matrix_transpose_path():
    g = jax.random.normal(jax.random.PRNGKey(2), (16, 80))
    o = zeropower_newtonschulz5(g, 5)
    assert o.shape == (16, 80)
    s = np.linalg.svd(np.asarray(o, np.float32), compute_uv=False)
    assert s.min() > 0.3


def test_param_split():
    assert is_muon_param(jnp.zeros((3, 3, 16, 32)))   # conv kernel
    assert is_muon_param(jnp.zeros((64, 128)))        # dense kernel
    assert not is_muon_param(jnp.zeros((128,)))       # bias / norm scale
    assert not is_muon_param(jnp.zeros((1, 1, 8, 1))) # 1-wide output


def test_muon_optimizer_descends_quadratic():
    w = jnp.asarray(jax.random.normal(jax.random.PRNGKey(3), (32, 16)))
    target = jnp.zeros_like(w)
    params = {"kernel": w, "bias": jnp.ones((16,))}

    def loss_fn(p):
        return jnp.sum(jnp.square(p["kernel"] - target)) + \
            jnp.sum(jnp.square(p["bias"]))

    opt = muon(0.3)
    state = opt.init(params)
    vals = []
    for _ in range(40):
        g = jax.grad(loss_fn)(params)
        upds, state = opt.update(g, state, params)
        params = optax.apply_updates(params, upds)
        vals.append(float(loss_fn(params)))
    assert vals[-1] < vals[0] * 0.5
    assert np.isfinite(vals).all()


def test_muon_in_train_step():
    from katago_tpu.train.train_step import (init_train_state, make_optimizer)
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel
    net = KataGoModel(MC.get_config("b1c6"), pos_len=5, dtype=jnp.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 5, 5, 22)),
                      jnp.zeros((1, 19)))
    opt = make_optimizer(lr=1e-3, kind="muon")
    state = init_train_state(params, opt)
    grads = jax.tree.map(jnp.ones_like, params)
    upds, _ = jax.jit(opt.update)(grads, state.opt_state, state.params)
    assert all(np.isfinite(np.asarray(u)).all()
               for u in jax.tree.leaves(upds))
