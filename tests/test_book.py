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
    book = Book(size=5)
    root = book.nodes[book.root_hash]
    root.winloss = 0.12
    root.policy = [(12, 0.5)]
    path = str(tmp_path / "b.json")
    book.save(path)
    back = Book.load(path)
    assert back.root_hash == book.root_hash
    assert back.nodes[back.root_hash].winloss == 0.12
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
