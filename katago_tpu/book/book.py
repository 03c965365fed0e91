"""Opening book generation — the reference's cpp/book layer (L11).

The reference Book (book.h:353, ~3.4k LoC) is a persistent graph of
BookNodes keyed by a symmetry-canonical position hash, expanded by a cost
model over search values/errors, serialized to a custom format and
exported as HTML (katagobooks.org). This module provides the same
capability TPU-natively, batch-first:

  - Book: node graph keyed by the engine's position ko-hash (symmetry
    canonicalization via the 8-fold dihedral minimum).
  - expansion loop: each round picks the cheapest frontier nodes by a
    cost = -(policy prior) * visits-discount + depth penalty (a
    simplification of book.h:67-115's biggestWLCostFromRoot machinery),
    searches them as ONE batched run_search call, and adds the best
    moves as children.
  - JSON save/load; HTML export with clickable child links (writebook).

Reference citations: cpp/book/book.h:118 (BookNode fields), book.h:353
(Book), cpp/command/genbook.cpp (expansion loop shape).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R


def canonical_hash(stones: np.ndarray, to_move: int, size: int) -> str:
    """Minimum position hash over the 8 dihedral symmetries (the
    reference's BookHash symmetry canonicalization, book.h:14-66)."""
    best = None
    a = np.asarray(stones, np.int8).reshape(size, size)
    for k in range(4):
        r = np.rot90(a, k)
        for f in (r, r.T):
            key = f.tobytes()
            if best is None or key < best:
                best = key
    import hashlib
    h = hashlib.blake2b(best + bytes([to_move]), digest_size=16)
    return h.hexdigest()


@dataclasses.dataclass
class BookMove:
    loc: int
    child_hash: str
    raw_policy: float


@dataclasses.dataclass
class BookNode:
    hash: str
    moves_from_root: list      # one representative line from the root
    to_move: int
    winloss: float = 0.0       # white perspective, from search
    score_mean: float = 0.0
    visits: int = 0
    policy: list | None = None  # top prior moves [(loc, prob)]
    moves: dict = dataclasses.field(default_factory=dict)  # loc -> BookMove
    can_expand: bool = True


class Book:
    def __init__(self, size: int = 19, rules: R.Rules | None = None):
        self.size = size
        self.rules = rules or R.Rules.tromp_taylorish()
        self.nodes: dict[str, BookNode] = {}
        root_stones = np.zeros(size * size, np.int8)
        rh = canonical_hash(root_stones, B.BLACK, size)
        self.root_hash = rh
        self.nodes[rh] = BookNode(hash=rh, moves_from_root=[],
                                  to_move=B.BLACK)

    # ---- persistence ----
    def save(self, path: str):
        data = {
            "size": self.size,
            "rules": self.rules.to_json_string(),
            "root": self.root_hash,
            "nodes": {
                h: {
                    "line": n.moves_from_root, "to_move": n.to_move,
                    "winloss": n.winloss, "score_mean": n.score_mean,
                    "visits": n.visits, "policy": n.policy,
                    "moves": [[m.loc, m.child_hash, m.raw_policy]
                              for m in n.moves.values()],
                    "can_expand": n.can_expand,
                } for h, n in self.nodes.items()
            },
        }
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(data, f)
        os.replace(tmp, path)

    @staticmethod
    def load(path: str) -> "Book":
        with open(path) as f:
            data = json.load(f)
        book = Book(size=data["size"], rules=R.Rules.parse(data["rules"]))
        book.nodes = {}
        book.root_hash = data["root"]
        for h, nd in data["nodes"].items():
            node = BookNode(hash=h, moves_from_root=nd["line"],
                            to_move=nd["to_move"], winloss=nd["winloss"],
                            score_mean=nd["score_mean"], visits=nd["visits"],
                            policy=nd["policy"], can_expand=nd["can_expand"])
            node.moves = {m[0]: BookMove(m[0], m[1], m[2])
                          for m in nd["moves"]}
            book.nodes[h] = node
        return book

    # ---- expansion ----
    def _game_state_for(self, node: BookNode) -> H.GameState:
        # fixed max_hist so book nodes stack into one search batch
        gs = H.new_game(self.size, H.RulesArr.from_rules(self.rules),
                        max_hist=2 * self.size * self.size)
        for mv in node.moves_from_root:
            gs, _ = H.step(gs, jnp.int32(mv), self.size)
        return gs

    def frontier(self, max_nodes_to_expand: int) -> list[BookNode]:
        """Cheapest expandable nodes: prefer shallow lines reached through
        high-prior moves (simplified book.h cost model)."""
        cands = []
        for n in self.nodes.values():
            if not n.can_expand:
                continue
            depth = len(n.moves_from_root)
            prior_bonus = 0.0
            if depth and n.moves_from_root:
                parent = self._parent_of(n)
                if parent and parent.policy:
                    for loc, p in parent.policy:
                        if loc == n.moves_from_root[-1]:
                            prior_bonus = p
                            break
            cost = depth - 2.0 * prior_bonus
            cands.append((cost, n.hash, n))
        cands.sort(key=lambda t: (t[0], t[1]))
        return [n for _, _, n in cands[:max_nodes_to_expand]]

    def _parent_of(self, node: BookNode) -> BookNode | None:
        if not node.moves_from_root:
            return None
        line = node.moves_from_root[:-1]
        gs_stones = self._replay_stones(line)
        pm = B.BLACK if len(line) % 2 == 0 else B.WHITE
        return self.nodes.get(canonical_hash(gs_stones, pm, self.size))

    def _replay_stones(self, line: list) -> np.ndarray:
        gs = H.new_game(self.size, H.RulesArr.from_rules(self.rules),
                        max_hist=len(line) + 8)
        for mv in line:
            gs, _ = H.step(gs, jnp.int32(mv), self.size)
        return np.asarray(gs.board.stones, np.int8)

    def expand(self, search_fn: Callable, nodes: list[BookNode],
               moves_per_node: int = 2) -> int:
        """Search the given nodes as one batch and add their top moves as
        children. search_fn(games_batch) -> SearchResult. Returns the
        number of new nodes added."""
        if not nodes:
            return 0
        states = [self._game_state_for(n) for n in nodes]
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *states)
        res = search_fn(batch)
        del states
        cv = np.asarray(res.child_visits, np.float32)
        prior = np.asarray(res.root_policy_prior)
        wl = np.asarray(res.root_winloss)
        sm = np.asarray(res.root_score_mean)
        rv = np.asarray(res.root_visits)
        added = 0
        for i, node in enumerate(nodes):
            node.winloss = float(wl[i])
            node.score_mean = float(sm[i])
            node.visits = int(rv[i])
            order = np.argsort(cv[i])[::-1]
            node.policy = [(int(a), float(max(prior[i, a], 0.0)))
                           for a in order[:8] if cv[i, a] > 0]
            node.can_expand = False
            for a in order[:moves_per_node]:
                if cv[i, a] <= 0 or a >= self.size * self.size:
                    continue
                line = node.moves_from_root + [int(a)]
                stones = self._replay_stones(line)
                nm = B.BLACK if len(line) % 2 == 0 else B.WHITE
                ch = canonical_hash(stones, nm, self.size)
                node.moves[int(a)] = BookMove(int(a), ch,
                                              float(max(prior[i, a], 0.0)))
                if ch not in self.nodes:
                    self.nodes[ch] = BookNode(hash=ch, moves_from_root=line,
                                              to_move=nm)
                    added += 1
        return added

    # ---- HTML export (writebook) ----
    def write_html(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        for h, n in self.nodes.items():
            rows = []
            for loc, m in sorted(n.moves.items()):
                child = self.nodes.get(m.child_hash)
                wl = f"{child.winloss:+.3f}" if child else "?"
                rows.append(
                    f'<tr><td><a href="{m.child_hash}.html">'
                    f"{_loc_str(loc, self.size)}</a></td>"
                    f"<td>{m.raw_policy:.3f}</td><td>{wl}</td></tr>")
            body = (
                f"<html><head><title>Book node {h[:12]}</title></head><body>"
                f"<h2>Node {h[:12]}</h2>"
                f"<p>line: {' '.join(_loc_str(m, self.size) for m in n.moves_from_root) or '(root)'}</p>"
                f"<p>winloss (white persp): {n.winloss:+.3f}, "
                f"score: {n.score_mean:+.1f}, visits: {n.visits}</p>"
                f"<table><tr><th>move</th><th>prior</th><th>child wl</th></tr>"
                + "".join(rows) + "</table></body></html>")
            with open(os.path.join(out_dir, f"{h}.html"), "w") as f:
                f.write(body)
        # index page
        with open(os.path.join(out_dir, "index.html"), "w") as f:
            f.write(f'<html><body><a href="{self.root_hash}.html">root'
                    f"</a> ({len(self.nodes)} nodes)</body></html>")


def _loc_str(loc: int, size: int) -> str:
    cols = "ABCDEFGHJKLMNOPQRSTUVWXYZ"
    if loc >= size * size:
        return "pass"
    x, y = loc % size, loc // size
    return f"{cols[x]}{size - y}"


def gen_book(model_apply, model_params, *, size: int, visits: int,
             rounds: int, nodes_per_round: int = 8,
             moves_per_node: int = 2,
             search_params=None, rules: R.Rules | None = None,
             book: Book | None = None, log=print) -> Book:
    """genbook command core: iterative batched expansion."""
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    book = book or Book(size=size, rules=rules)
    sp = (search_params or SearchParams()).to_arr()
    search_fn = jax.jit(lambda roots: mcts.run_search(
        model_apply, model_params, roots, sp, jax.random.PRNGKey(7),
        size=size, num_sims=visits, max_nodes=visits + 3,
        with_ladders=False))
    for rnd in range(rounds):
        nodes = book.frontier(nodes_per_round)
        if not nodes:
            break
        added = book.expand(search_fn, nodes,
                            moves_per_node=moves_per_node)
        log(f"  book round {rnd}: expanded {len(nodes)} nodes, "
            f"+{added} new, total {len(book.nodes)}")
    return book
