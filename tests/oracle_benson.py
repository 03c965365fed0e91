"""Scalar python Benson pass-alive oracle mirroring Board::calculateAreaForPla.

Readable set-based implementation of the reference semantics for
cross-checking katago_tpu.game.benson.
"""

from __future__ import annotations

EMPTY, BLACK, WHITE = 0, 1, 2


def _neighbors(p, size):
    x, y = p % size, p // size
    if x > 0:
        yield p - 1
    if x < size - 1:
        yield p + 1
    if y > 0:
        yield p - size
    if y < size - 1:
        yield p + size


def _components(points, size):
    """Connected components of a point set. Returns list of frozensets."""
    points = set(points)
    comps = []
    while points:
        seed = next(iter(points))
        comp, stack = set(), [seed]
        while stack:
            q = stack.pop()
            if q in comp:
                continue
            comp.add(q)
            for r in _neighbors(q, size):
                if r in points and r not in comp:
                    stack.append(r)
        points -= comp
        comps.append(frozenset(comp))
    return comps


def area_for_pla(stones, pla, size, suicide_legal,
                 safe_big, unsafe_big):
    """Returns (mark_all set, mark_if_empty set)."""
    nn = size * size
    opp = 3 - pla
    pla_pts = {p for p in range(nn) if stones[p] == pla}
    region_pts = {p for p in range(nn) if stones[p] != pla}

    chains = _components(pla_pts, size)
    regions = _components(region_pts, size)
    chain_of = {}
    for i, c in enumerate(chains):
        for p in c:
            chain_of[p] = i

    def adj_chains(p):
        return {chain_of[q] for q in _neighbors(p, size) if q in chain_of}

    # vitality: chain adjacent to every counting point of the region
    vital = {}  # region idx -> set of chain idx
    for ri, r in enumerate(regions):
        counting = [p for p in r if suicide_legal or stones[p] == EMPTY]
        if not counting:
            vital[ri] = set()
            continue
        sets = [adj_chains(p) for p in counting]
        v = set.intersection(*sets) if sets else set()
        vital[ri] = v

    region_adj = {ri: set() for ri in range(len(regions))}
    for ri, r in enumerate(regions):
        for p in r:
            region_adj[ri] |= adj_chains(p)

    alive = set(range(len(chains)))
    region_ok = set(range(len(regions)))
    while True:
        vcount = {ci: 0 for ci in alive}
        for ri in region_ok:
            for ci in vital[ri]:
                if ci in alive:
                    vcount[ci] += 1
        killed = {ci for ci in alive if vcount[ci] < 2}
        if not killed:
            break
        alive -= killed
        region_ok = {ri for ri in region_ok
                     if not (region_adj[ri] & killed)}

    mark_all, mark_if_empty = set(), set()
    for ci in alive:
        mark_all |= chains[ci]

    at_least_one_pla = bool(pla_pts)
    for ri, r in enumerate(regions):
        borders_dead = bool(region_adj[ri] - alive)
        n_internal = sum(1 for p in r if not any(q in pla_pts for q in _neighbors(p, size)))
        contains_opp = any(stones[p] == opp for p in r)
        should = (n_internal <= 1 and not borders_dead and at_least_one_pla) or \
                 (safe_big and not contains_opp and not borders_dead and at_least_one_pla)
        if should:
            mark_all |= r
        elif unsafe_big and not contains_opp and at_least_one_pla:
            mark_if_empty |= {p for p in r if stones[p] == EMPTY}
    return mark_all, mark_if_empty


def calculate_area(stones, size, non_pass_alive_stones, safe_big,
                   unsafe_big, suicide_legal):
    nn = size * size
    result = [EMPTY] * nn
    b_all, b_unsafe = area_for_pla(stones, BLACK, size, suicide_legal, safe_big, unsafe_big)
    w_all, w_unsafe = area_for_pla(stones, WHITE, size, suicide_legal, safe_big, unsafe_big)
    for p in b_all:
        result[p] = BLACK
    for p in b_unsafe:
        if result[p] == EMPTY:
            result[p] = BLACK
    for p in w_all:
        result[p] = WHITE
    for p in w_unsafe:
        if result[p] == EMPTY:
            result[p] = WHITE
    if non_pass_alive_stones:
        for p in range(nn):
            if result[p] == EMPTY:
                result[p] = stones[p]
    return result
