"""Chase-solver tests (the in-search ladder variant, ladder.py).

The chase must agree exactly with the backtracking solver on canonical
ladder shapes (clean cross-board ladders, breakers, attacker support),
and its incremental head-liberty accounting must match the exact
chain-liberty recompute after every legal move of a random sequence.
"""

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import ladder as LAD
from katago_tpu.game.ladder import ladder_map, ladder_map_chase


def _pt(x, y, size):
    return y * size + x


def _canonical_cases(size=19):
    nn = size * size
    base = np.zeros(nn, np.int32)
    base[_pt(2, 2, size)] = B.WHITE
    base[_pt(1, 2, size)] = B.BLACK
    base[_pt(2, 1, size)] = B.BLACK
    base[_pt(3, 1, size)] = B.BLACK
    cases = {"clean": base.copy()}
    b = base.copy(); b[_pt(10, 10, size)] = B.WHITE
    cases["breaker_on_diag"] = b
    b = base.copy(); b[_pt(9, 10, size)] = B.WHITE
    cases["breaker_near_diag"] = b
    b = base.copy(); b[_pt(10, 10, size)] = B.BLACK
    cases["attacker_support"] = b
    b = base.copy(); b[_pt(18, 18, size)] = B.WHITE
    b[_pt(17, 18, size)] = B.WHITE
    cases["corner_breaker"] = b
    return cases


def test_chase_matches_exact_on_canonical_ladders():
    size = 19
    ex = jax.jit(lambda s: ladder_map(s, size, 16))
    ch = jax.jit(lambda s: ladder_map_chase(s, size, 16))
    for name, st in _canonical_cases(size).items():
        e = ex(jnp.asarray(st))
        c = ch(jnp.asarray(st))
        for f in e._fields:
            a, b = np.asarray(getattr(e, f)), np.asarray(getattr(c, f))
            assert (a == b).all(), (
                f"{name}.{f}: exact={np.where(a)[0]} chase={np.where(b)[0]}")


def test_chase_clean_ladder_is_laddered():
    size = 19
    st = _canonical_cases(size)["clean"]
    res = ladder_map_chase(jnp.asarray(st), size, 16)
    lad = np.asarray(res.laddered)
    assert lad[_pt(2, 2, size)]
    # exactly one working attacker move (the (2,3) side; the (3,2) side
    # gives white three liberties after the extension)
    working = np.asarray(res.working_vs_white)
    assert working[_pt(2, 3, size)]
    assert not working[_pt(3, 2, size)]


def test_chase_apply_hlibs_exact():
    """_chase_apply's incremental head-liberty counts equal the exact
    recompute after every legal move of a random sequence."""
    size = 9
    nn = size * size
    rng = np.random.RandomState(11)
    stones = jnp.zeros((nn,), jnp.int32)
    labels = LAD._stone_labels(stones, size)
    hlibs = B.chain_liberties(stones, labels, size)
    player = B.BLACK
    apply_fn = jax.jit(LAD._chase_apply, static_argnums=(5,))
    played = 0
    for step in range(120):
        empties = np.where(np.asarray(stones) == B.EMPTY)[0]
        if empties.size == 0:
            break
        m = int(rng.choice(empties))
        ns, nl, nh, nko, legal, ov = apply_fn(
            stones, labels, hlibs, jnp.int32(m), jnp.int32(player), size)
        if not bool(legal) or bool(ov):
            continue
        stones, labels, hlibs = ns, nl, nh
        played += 1
        # labels must equal the fixpoint labeling
        want_labels = LAD._stone_labels(stones, size)
        assert (np.asarray(labels) == np.asarray(want_labels)).all(), step
        # hlibs at heads must equal the exact chain liberties
        want_libs = np.asarray(B.chain_liberties(stones, want_labels, size))
        got = np.asarray(hlibs)
        lab = np.asarray(labels)
        st = np.asarray(stones)
        occ = st != B.EMPTY
        heads = np.unique(lab[occ])
        for h in heads:
            assert got[h] == want_libs[h], (
                f"step {step}: chain head {h} hlibs={got[h]} "
                f"want {want_libs[h]}")
        player = int(B.opponent(jnp.int32(player)))
    assert played > 60


def test_chase_matches_exact_on_9x9_fixtures():
    size = 9
    nn = size * size
    st = np.zeros(nn, np.int32)
    # the test_ladder.py canonical 1-lib working shape
    st[_pt(2, 2, size)] = B.WHITE
    st[_pt(1, 2, size)] = B.BLACK
    st[_pt(2, 1, size)] = B.BLACK
    st[_pt(3, 1, size)] = B.BLACK
    st[_pt(2, 3, size)] = B.BLACK   # 1 lib left at (3,2)
    e = ladder_map(jnp.asarray(st), size, 16)
    c = ladder_map_chase(jnp.asarray(st), size, 16)
    for f in e._fields:
        assert (np.asarray(getattr(e, f)) == np.asarray(getattr(c, f))).all()
