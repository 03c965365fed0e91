"""Model export round-trip tests: flax params -> reference .bin.gz format
-> desc loader -> bit-identical forward (export_model_pytorch.py role,
via models/export.py + models/desc.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.models import config as MC
from katago_tpu.models import desc as D
from katago_tpu.models import export as E
from katago_tpu.models.model import KataGoModel

SIZE = 7


def _round_trip(name, tmp_path):
    cfg = MC.get_config(name)
    m = KataGoModel(cfg, pos_len=SIZE, dtype=jnp.float32)
    sp = jax.random.bernoulli(jax.random.PRNGKey(3), 0.3,
                              (2, SIZE, SIZE, 22)).astype(jnp.float32)
    gl = jax.random.normal(jax.random.PRNGKey(4), (2, 19)) * 0.1
    params = m.init(jax.random.PRNGKey(0), sp, gl)
    path = str(tmp_path / f"{name}.bin.gz")
    E.export_model(params, cfg, path)
    net = D.load_model(path)
    out_d = D.apply_desc_model(net, sp, gl)
    out_f = m.apply(params, sp, gl)
    return out_f, out_d


@pytest.mark.parametrize("name", ["b2c16", "b5c192nbt"])
def test_export_round_trip_bit_exact(name, tmp_path):
    out_f, out_d = _round_trip(name, tmp_path)
    for key in ["policy_logits", "value_logits", "ownership_pretanh"]:
        np.testing.assert_array_equal(np.asarray(out_f[key]),
                                      np.asarray(out_d[key]))
    np.testing.assert_array_equal(np.asarray(out_f["miscvalue"]),
                                  np.asarray(out_d["miscvalue"]))


def test_export_transformer_rejected(tmp_path):
    cfg = MC.get_config("b5c48h3tfr")
    m = KataGoModel(cfg, pos_len=SIZE, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 22)),
                    jnp.zeros((1, 19)))
    with pytest.raises(ValueError):
        E.export_model(params, cfg, str(tmp_path / "t.bin.gz"))


def test_exported_model_plays_in_search(tmp_path):
    """An exported net drops into run_search via the desc adapter."""
    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    cfg = MC.get_config("b2c16")
    m = KataGoModel(cfg, pos_len=SIZE, dtype=jnp.float32)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 22)),
                    jnp.zeros((1, 19)))
    path = str(tmp_path / "m.bin.gz")
    E.export_model(params, cfg, path)
    net = D.load_model(path)
    apply_fn = D.make_desc_apply(net)

    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=60)
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(),
                         gs)
    sp = SearchParams().to_arr()
    res = mcts.run_search(apply_fn, None, roots, sp, jax.random.PRNGKey(1),
                          size=SIZE, num_sims=10, max_nodes=13,
                          with_ladders=False)
    assert int(res.root_visits[0]) == 11  # root eval + 10 sims
