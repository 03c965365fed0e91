"""Pure-python scalar Go engine used as a test oracle.

Deliberately simple and readable: flood fills with explicit sets, no
incremental state. The vectorized JAX engine in katago_tpu.game is
cross-checked against this on randomized games (tests/test_board.py).
Semantics follow the reference cpp/game/board.cpp behavior: captures before
suicide, multi-stone suicide only if allowed, single-stone suicide illegal,
simple-ko ban, Tromp-Taylor area scoring.
"""

from __future__ import annotations

EMPTY, BLACK, WHITE = 0, 1, 2


class OracleBoard:
    def __init__(self, size: int, multi_suicide_legal: bool = True):
        self.size = size
        self.stones = [EMPTY] * (size * size)
        self.ko_loc = -1
        self.multi_suicide_legal = multi_suicide_legal

    def neighbors(self, p: int):
        s = self.size
        x, y = p % s, p // s
        if x > 0:
            yield p - 1
        if x < s - 1:
            yield p + 1
        if y > 0:
            yield p - s
        if y < s - 1:
            yield p + s

    def chain_and_libs(self, p: int):
        color = self.stones[p]
        assert color != EMPTY
        chain, libs = set(), set()
        stack = [p]
        while stack:
            q = stack.pop()
            if q in chain:
                continue
            chain.add(q)
            for r in self.neighbors(q):
                if self.stones[r] == color:
                    stack.append(r)
                elif self.stones[r] == EMPTY:
                    libs.add(r)
        return chain, libs

    def is_legal(self, p: int, player: int) -> bool:
        if p == self.size * self.size:  # pass
            return True
        if self.stones[p] != EMPTY or p == self.ko_loc:
            return False
        opp = 3 - player
        has_empty = any(self.stones[q] == EMPTY for q in self.neighbors(p))
        if has_empty:
            return True
        # captures an opp chain in atari?
        for q in self.neighbors(p):
            if self.stones[q] == opp:
                _, libs = self.chain_and_libs(q)
                if libs == {p}:
                    return True
        # joins own chain with another liberty?
        own_nbr = False
        for q in self.neighbors(p):
            if self.stones[q] == player:
                own_nbr = True
                _, libs = self.chain_and_libs(q)
                if libs - {p}:
                    return True
        # suicide
        return self.multi_suicide_legal and own_nbr

    def play(self, p: int, player: int) -> int:
        """Apply move (must be legal). Returns number of opp stones captured."""
        nn = self.size * self.size
        if p == nn:
            self.ko_loc = -1
            return 0
        opp = 3 - player
        self.stones[p] = player
        captured = []
        for q in self.neighbors(p):
            if self.stones[q] == opp:
                chain, libs = self.chain_and_libs(q)
                if not libs:
                    captured.extend(chain)
        for q in set(captured):
            self.stones[q] = EMPTY
        ncap = len(set(captured))
        if ncap == 0:
            chain, libs = self.chain_and_libs(p)
            if not libs:  # legal suicide
                for q in chain:
                    self.stones[q] = EMPTY
        # simple ko
        self.ko_loc = -1
        if ncap == 1 and self.stones[p] == player:
            chain, libs = self.chain_and_libs(p)
            if len(chain) == 1 and len(libs) == 1:
                self.ko_loc = captured[0]
        return ncap

    def area_score(self):
        """Tromp-Taylor. Returns (ownership list, black-minus-white score)."""
        nn = self.size * self.size
        own = [0] * nn
        for p in range(nn):
            if self.stones[p] == BLACK:
                own[p] = 1
            elif self.stones[p] == WHITE:
                own[p] = -1
        seen = set()
        for p in range(nn):
            if self.stones[p] != EMPTY or p in seen:
                continue
            region, borders = set(), set()
            stack = [p]
            while stack:
                q = stack.pop()
                if q in region:
                    continue
                region.add(q)
                for r in self.neighbors(q):
                    if self.stones[r] == EMPTY:
                        stack.append(r)
                    else:
                        borders.add(self.stones[r])
            seen |= region
            if borders == {BLACK}:
                for q in region:
                    own[q] = 1
            elif borders == {WHITE}:
                for q in region:
                    own[q] = -1
        return own, float(sum(own))
