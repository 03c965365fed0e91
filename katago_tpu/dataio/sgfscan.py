"""Fast native SGF main-line scanning (native/sgfscan.cpp).

Bulk data-mining commands (writetrainingdata, startposes,
summarize_sgfs, genboard training) read thousands of SGF files; the
python parser's per-character loop dominates their wall-clock. This
wrapper scans one game's main line in C++ — size/komi/handicap/result,
player names, moves, and setup stones — returning the same flat-loc
conventions as katago_tpu.dataio.sgf. Falls back to the python parser
when the shared library isn't built (native/build.sh).
"""

from __future__ import annotations

import ctypes
import dataclasses
import os

import numpy as np

_LIB = None
_TRIED = False
MAX_MOVES = 4096
MAX_SETUP = 1024
NAME_CAP = 128


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native",
        "libktsgfscan.so")
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    i64 = ctypes.c_int64
    lib.kt_sgf_scan_mainline.restype = i64
    lib.kt_sgf_scan_mainline.argtypes = [
        ctypes.c_char_p, i64, i32p, f32p, i32p, i32p, f32p,
        i32p, i32p, i64, i32p, i32p, i64,
        ctypes.c_char_p, ctypes.c_char_p, i64]
    _LIB = lib
    return lib


def have_native() -> bool:
    return _load() is not None


@dataclasses.dataclass
class SgfSummary:
    """Main-line facts of one game, in dataio.sgf conventions."""
    x_size: int
    y_size: int
    komi: float
    handicap: int
    result: int          # 0 unknown, 1 B+, 2 W+, 3 draw
    margin: float
    black_name: str
    white_name: str
    moves: list          # [(pla 1/2, flat x_size-stride loc; pass=x*y)]
    setup_stones: list   # [(color 1/2, flat loc)]

    @property
    def size(self):
        return (self.x_size, self.y_size)

    @property
    def result_str(self) -> str | None:
        if self.result == 1:
            return f"B+{self.margin:g}" if self.margin else "B+R"
        if self.result == 2:
            return f"W+{self.margin:g}" if self.margin else "W+R"
        if self.result == 3:
            return "0"
        return None


def scan_sgf(text: str) -> SgfSummary | None:
    """Scan one SGF game's main line natively; None on parse failure or
    when the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = text.encode("utf-8", errors="replace")
    xy = np.zeros(2, np.int32)
    komi = np.zeros(1, np.float32)
    handicap = np.zeros(1, np.int32)
    result = np.zeros(1, np.int32)
    margin = np.zeros(1, np.float32)
    plas = np.zeros(MAX_MOVES, np.int32)
    locs = np.zeros(MAX_MOVES, np.int32)
    scols = np.zeros(MAX_SETUP, np.int32)
    slocs = np.zeros(MAX_SETUP, np.int32)
    pb = ctypes.create_string_buffer(NAME_CAP)
    pw = ctypes.create_string_buffer(NAME_CAP)
    packed = lib.kt_sgf_scan_mainline(
        raw, len(raw), xy, komi, handicap, result, margin,
        plas, locs, MAX_MOVES, scols, slocs, MAX_SETUP, pb, pw, NAME_CAP)
    if packed < 0:
        return None
    nmoves = int(packed) >> 20
    nsetup = int(packed) & ((1 << 20) - 1)
    if nmoves > MAX_MOVES:
        return None
    return SgfSummary(
        x_size=int(xy[0]), y_size=int(xy[1]), komi=float(komi[0]),
        handicap=int(handicap[0]), result=int(result[0]),
        margin=float(margin[0]),
        black_name=pb.value.decode("utf-8", errors="replace"),
        white_name=pw.value.decode("utf-8", errors="replace"),
        moves=[(int(plas[i]), int(locs[i])) for i in range(nmoves)],
        setup_stones=[(int(scols[i]), int(slocs[i]))
                      for i in range(nsetup)])


def scan_sgf_or_parse(text: str) -> SgfSummary | None:
    """Native scan with python-parser fallback (identical fields)."""
    out = scan_sgf(text)
    if out is not None:
        return out
    from katago_tpu.dataio import sgf as S
    try:
        game = S.parse_sgf(text)[0]
    except Exception:
        return None
    xs, ys = game.size
    res = game.result or ""
    result = 0
    marginv = 0.0
    ru = res.upper()
    if ru.startswith("B+"):
        result = 1
    elif ru.startswith("W+"):
        result = 2
    elif ru in ("0", "DRAW"):
        result = 3
    if result in (1, 2):
        try:
            marginv = float(res[2:])
        except ValueError:
            marginv = 0.0
    return SgfSummary(
        x_size=xs, y_size=ys, komi=game.komi, handicap=game.handicap,
        result=result, margin=marginv,
        black_name=game.root.get("PB") or "",
        white_name=game.root.get("PW") or "",
        moves=game.moves(), setup_stones=game.setup_stones())
