"""Pure-python scalar ladder oracle — a direct transcription of the
reference's search semantics (Board::searchIsLadderCaptured and
searchIsLadderCapturedAttackerFirst2Libs, cpp/game/board.cpp:1581-1851)
for cross-checking katago_tpu.game.ladder on arbitrary boards.

Independent implementation style: plain recursion over python board
copies, sets for chains — the slowest clearest thing that can be right.
"""

from __future__ import annotations

EMPTY, BLACK, WHITE = 0, 1, 2


def opponent(p):
    return BLACK + WHITE - p


class OBoard:
    def __init__(self, stones, size):
        self.size = size
        self.stones = list(stones)
        self.ko_loc = -1

    def neighbors(self, p):
        s = self.size
        y, x = divmod(p, s)
        if y > 0:
            yield p - s
        if y < s - 1:
            yield p + s
        if x > 0:
            yield p - 1
        if x < s - 1:
            yield p + 1

    def chain(self, p):
        color = self.stones[p]
        seen = {p}
        stack = [p]
        while stack:
            q = stack.pop()
            for r in self.neighbors(q):
                if self.stones[r] == color and r not in seen:
                    seen.add(r)
                    stack.append(r)
        return seen

    def liberties(self, chain):
        libs = set()
        for q in chain:
            for r in self.neighbors(q):
                if self.stones[r] == EMPTY:
                    libs.add(r)
        return libs

    def num_libs(self, p):
        return len(self.liberties(self.chain(p)))

    def is_legal(self, move, pla):
        """Suicide illegal, simple ko checked (board.cpp isLegal with
        isMultiStoneSuicideLegal=false)."""
        if move == self.ko_loc:
            return False
        if self.stones[move] != EMPTY:
            return False
        opp = opponent(pla)
        # would capture something?
        for r in self.neighbors(move):
            if self.stones[r] == opp and self.num_libs(r) == 1:
                return True
            if self.stones[r] == EMPTY:
                return True
            if self.stones[r] == pla and self.num_libs(r) >= 2:
                return True
        return False

    def play(self, move, pla):
        """Returns an undo record. Assumes legal."""
        opp = opponent(pla)
        captured = []
        for r in list(self.neighbors(move)):
            if self.stones[r] == opp and self.num_libs(r) == 1:
                ch = self.chain(r)
                for q in ch:
                    if self.stones[q] == opp:
                        captured.append(q)
        captured = sorted(set(captured))
        old_ko = self.ko_loc
        for q in captured:
            self.stones[q] = EMPTY
        self.stones[move] = pla
        # simple ko: single capture, new stone alone in atari
        if (len(captured) == 1
                and all(self.stones[r] != pla for r in self.neighbors(move))
                and self.num_libs(move) == 1):
            self.ko_loc = captured[0]
        else:
            self.ko_loc = -1
        return (move, pla, captured, old_ko)

    def undo(self, record):
        move, pla, captured, old_ko = record
        self.stones[move] = EMPTY
        for q in captured:
            self.stones[q] = opponent(pla)
        self.ko_loc = old_ko


def _would_be_ko_capture(board: OBoard, loc, pla):
    """board.cpp:518-545."""
    if board.stones[loc] != EMPTY:
        return False
    opp = opponent(pla)
    capturable = None
    for adj in board.neighbors(loc):
        if board.stones[adj] != opp:
            return False
        if board.num_libs(adj) == 1:
            if capturable is not None:
                return False
            capturable = adj
    # walls are fine (neighbors() yields only on-board points); but all
    # on-board neighbors must be opp — checked above
    if capturable is None:
        return False
    return len(board.chain(capturable)) == 1


def _liberty_gaining_captures(board: OBoard, chain):
    """Lone liberties of opp chains in atari adjacent to `chain`
    (board.cpp:1522)."""
    pla = board.stones[next(iter(chain))]
    opp = opponent(pla)
    moves = []
    seen_chains = []
    for q in sorted(chain):
        for adj in board.neighbors(q):
            if board.stones[adj] == opp:
                och = board.chain(adj)
                if any(och == c for c in seen_chains):
                    continue
                seen_chains.append(och)
                libs = board.liberties(och)
                if len(libs) == 1:
                    moves.append(next(iter(libs)))
    out = []
    for m in moves:  # dedupe preserving order
        if m not in out:
            out.append(m)
    return out


def search_is_ladder_captured(board: OBoard, loc, defender_first,
                              depth=0, max_depth=300):
    """board.cpp:1628-1851, recursive form. Returns True = captured."""
    if board.stones[loc] not in (BLACK, WHITE):
        return False
    pla = board.stones[loc]
    opp = opponent(pla)
    ch = board.chain(loc)
    libs = board.liberties(ch)
    if len(libs) > 2 or (defender_first and len(libs) > 1):
        return False

    saved_ko = board.ko_loc
    if defender_first:
        board.ko_loc = -1
    try:
        return _search(board, loc, pla, opp, defender_first, depth,
                       max_depth)
    finally:
        board.ko_loc = saved_ko


def _search(board, loc, pla, opp, is_defender, depth, max_depth):
    if depth >= max_depth:
        return True  # stack-limit bias: captured
    if board.stones[loc] != pla:
        return True  # chain gone
    ch = board.chain(loc)
    libs = board.liberties(ch)
    n = len(libs)

    if is_defender:
        if board.ko_loc >= 0:
            return False  # defender wins all kos
        if n >= 2:
            return False
        caps = _liberty_gaining_captures(board, ch)
        moves = caps + sorted(libs)
        for m in moves:
            if not board.is_legal(m, pla):
                continue
            rec = board.play(m, pla)
            r = _search(board, loc, pla, opp, False, depth + 1, max_depth)
            board.undo(rec)
            if not r:
                return False
        return True
    else:
        if n <= 1:
            return True
        if n >= 3:
            return False
        l0, l1 = sorted(libs)
        # double-ko death (board.cpp:1746-1756)
        imm0 = sum(1 for r in board.neighbors(l0)
                   if board.stones[r] == EMPTY)
        imm1 = sum(1 for r in board.neighbors(l1)
                   if board.stones[r] == EMPTY)
        if imm0 == 0 and imm1 == 0 and \
                _would_be_ko_capture(board, l0, opp) and \
                _would_be_ko_capture(board, l1, opp):
            # getNumLibertiesAfterPlay is pseudo-legal: no ko/legality check
            def libs_after(m):
                saved_ko = board.ko_loc
                board.ko_loc = -1
                rec = board.play(m, pla)
                v = len(board.liberties(board.chain(loc)))
                board.undo(rec)
                board.ko_loc = saved_ko
                return v
            if libs_after(l0) <= 2 and libs_after(l1) <= 2 and \
                    not _liberty_gaining_captures(board, ch):
                return True
        for m in (l0, l1):
            if not board.is_legal(m, opp):
                continue
            rec = board.play(m, opp)
            r = _search(board, loc, pla, opp, True, depth + 1, max_depth)
            board.undo(rec)
            if r:
                return True
        return False


def attacker_first_2libs(board: OBoard, loc):
    """board.cpp:1581-1625: (captured, working_first_moves)."""
    if board.stones[loc] not in (BLACK, WHITE):
        return False, []
    ch = board.chain(loc)
    libs = sorted(board.liberties(ch))
    if len(libs) != 2:
        return False, []
    opp = opponent(board.stones[loc])
    working = []
    for m in libs:
        if not board.is_legal(m, opp):
            continue
        rec = board.play(m, opp)
        if search_is_ladder_captured(board, loc, True):
            working.append(m)
        board.undo(rec)
    return bool(working), working


def ladder_map_oracle(stones, size):
    """iterLadders semantics (nninputs.cpp:815-866): returns
    (laddered bool[NN], working_vs_black bool[NN], working_vs_white)."""
    nn = size * size
    board = OBoard(stones, size)
    laddered = [False] * nn
    wvb = [False] * nn
    wvw = [False] * nn
    solved = {}
    for p in range(nn):
        if board.stones[p] == EMPTY:
            continue
        ch = board.chain(p)
        rep = min(ch)
        if rep in solved:
            if solved[rep]:
                laddered[p] = True
            continue
        n = len(board.liberties(ch))
        if n not in (1, 2):
            continue
        if n == 1:
            cap = search_is_ladder_captured(board, p, True)
            working = []
        else:
            cap, working = attacker_first_2libs(board, p)
        solved[rep] = cap
        if cap:
            laddered[p] = True
            if n == 2:
                tgt = wvb if board.stones[p] == BLACK else wvw
                for m in working:
                    tgt[m] = True
    return laddered, wvb, wvw
