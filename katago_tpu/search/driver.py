"""Chunked search driver: time management, streaming analysis, pondering.

TPU-native replacement for cpp/search/asyncbot.{cpp,h} and the in-search
clock checks of Search::runWholeSearch (search.cpp:473-607). The
reference interrupts playout threads mid-search on a wall clock or an
analyze callback; here the host executes the jitted playout kernel in
fixed-size chunks and decides *between* chunks: stop on visit budget,
wall clock, a stop event (the ponder/analyze interrupt), or emit a
streaming analysis callback. One compiled (init, chunk, collect) triple
is cached per configuration; the visit cap is a traced scalar so every
budget shares one executable.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParamsArr

BIG_VISITS = 1 << 30


class SearchDriver:
    """Compiled chunk-stepped search over a fixed (size, max_nodes, chunk)
    configuration. Drives any [G]-batch of games."""

    def __init__(self, model_apply: Callable, model_params: Any,
                 sp: SearchParamsArr, *, size: int, max_nodes: int,
                 chunk_size: int = 16, max_depth: int = 64,
                 with_ladders: bool = True,
                 ladder_mode: str = "chase",
                 root_num_symmetries: int = 1,
                 sgf_meta=None,
                 feature_version: int = 7):
        self.sp = sp
        self.size = size
        self.max_nodes = max_nodes
        self.chunk_size = chunk_size
        self._jits: dict = {}
        self._model_apply = model_apply
        self._model_params = model_params
        self._max_depth = max_depth
        self._with_ladders = with_ladders
        self._ladder_mode = ladder_mode
        self.root_num_symmetries = root_num_symmetries
        self._sgf_meta = sgf_meta
        self._feature_version = feature_version

    # -- compiled pieces --------------------------------------------------

    def _get(self, key, build):
        if key not in self._jits:
            self._jits[key] = build()
        return self._jits[key]

    def init_fn(self, reuse: bool, reuse_actions: bool = False,
                masked: bool = False, mo: bool = False):
        def build():
            def f(sp, roots, rng, mirror, mask, *prev):
                pt = prev[0] if prev else None
                pa = prev[1] if len(prev) > 1 else None
                return mcts.init_search(
                    self._model_apply, self._model_params, roots, sp,
                    rng, size=self.size, max_nodes=self.max_nodes,
                    with_ladders=self._with_ladders,
                    ladder_mode=self._ladder_mode, prev_tree=pt,
                    prev_actions=pa, mirror=mirror,
                    root_allowed_mask=mask,
                    sgf_meta=self._sgf_meta,
                    root_num_symmetries=self.root_num_symmetries,
                    feature_version=self._feature_version,
                    track_moves_ownership=mo)
            if masked:
                return jax.jit(f)
            return jax.jit(lambda sp, roots, rng, mirror, *prev: f(
                sp, roots, rng, mirror, None, *prev))
        return self._get(("init", reuse, reuse_actions, masked, mo), build)

    def chunk_fn(self, mo: bool = False):
        def build():
            def f(sp, ss, rng, max_visits, active_mask, mirror,
                  pattern_bonus):
                return mcts.run_playouts(
                    self._model_apply, self._model_params, ss, sp, rng,
                    size=self.size, num_sims=self.chunk_size,
                    max_depth=self._max_depth,
                    with_ladders=self._with_ladders,
                    ladder_mode=self._ladder_mode,
                    sgf_meta=self._sgf_meta,
                    max_visits=max_visits, active_mask=active_mask,
                    mirror=mirror, pattern_bonus=pattern_bonus,
                    feature_version=self._feature_version,
                    track_moves_ownership=mo)
            return jax.jit(f)
        return self._get(("chunk", mo), build)

    def collect_fn(self):
        return self._get(("collect",), lambda: jax.jit(mcts.collect_results))

    def pv_fn(self, max_len: int = 15):
        return self._get(("pv", max_len), lambda: jax.jit(
            jax.vmap(lambda t: mcts.extract_pv(t, max_len))))

    # -- the drive loop ---------------------------------------------------

    def search(self, roots, rng, *,
               max_visits: int | None = None,
               min_time: float = 0.0,
               max_time: float | None = None,
               active_mask=None,
               prev_tree=None, prev_actions=None,
               callback: Callable | None = None,
               callback_interval: float = 1.0,
               stop_event: threading.Event | None = None,
               should_stop: Callable[[], bool] | None = None,
               time_rec: float | None = None,
               time_max: float | None = None,
               turn_number: int = 0,
               host_params=None,
               root_allowed_mask=None,
               mirror=None, pattern_bonus=None,
               sp=None,
               track_moves_ownership: bool = False) -> mcts.SearchResult:
        """Run a time/visit/interrupt-bounded search.

        max_visits: per-game root visit cap (None = unbounded, needs
        max_time or stop_event). max_time: wall-clock cap, checked between
        chunks (the lag-buffered recommendation from TimeControls).
        min_time: do not stop on visits before this much wall time.
        callback(result, elapsed_s): streaming analysis hook, called at
        most every callback_interval seconds (kata-analyze interval).
        stop_event: external interrupt (pondering / analyze cancellation).
        should_stop(): polled between chunks (e.g. stdin readability for
        GTP analyze interruption).

        time_rec/time_max + host_params (a SearchParams with the
        host-side time-manager knobs): dynamic time management
        (Search::recomputeSearchTimeLimit) — the planned limit is
        recomputed between chunks with midgame weighting and the
        obvious-move discount from the live root entropy/surprise, and
        futileVisitsThreshold stops the search early once no
        alternative move can catch the leader in the time remaining
        (single-game searches only).
        """
        g = roots.hist_len.shape[0]
        rng, r_init = jax.random.split(rng)
        if sp is None:
            sp = self.sp
        mo = track_moves_ownership
        masked = root_allowed_mask is not None
        margs = (root_allowed_mask,) if masked else ()
        if prev_tree is not None and prev_actions is not None:
            ss = self.init_fn(True, True, masked, mo)(
                sp, roots, r_init, mirror, *margs, prev_tree, prev_actions)
        elif prev_tree is not None:
            ss = self.init_fn(True, masked=masked, mo=mo)(
                sp, roots, r_init, mirror, *margs, prev_tree)
        else:
            ss = self.init_fn(False, masked=masked, mo=mo)(
                sp, roots, r_init, mirror, *margs)

        if time_rec is not None and max_time is None:
            max_time = time_rec   # refined between chunks below
        if max_visits is None and max_time is None and stop_event is None \
                and should_stop is None:
            raise ValueError("search needs a visit cap, time cap, or "
                             "stop condition")
        cap = jnp.int32(max_visits if max_visits is not None else BIG_VISITS)
        amask = (jnp.ones((g,), bool) if active_mask is None
                 else jnp.asarray(active_mask))
        chunk = self.chunk_fn(mo)
        t0 = time.time()
        last_cb = t0
        chunks_done = 0
        # Pure visit-budget searches know their chunk count a priori: run
        # those chunks with NO host polling (each tree-visits fetch is a
        # pipeline-draining device sync — ~1s per chunk on a tunneled
        # TPU, measured ~38% of search wall-clock), then fall into the
        # polling loop to top up voided playouts. A fresh root has
        # exactly 1 visit; a reused tree costs one sync to learn its
        # minimum.
        if (max_time is None and time_rec is None and stop_event is None
                and should_stop is None and callback is None
                and max_visits is not None and max_visits < BIG_VISITS):
            if prev_tree is None:
                visits0 = 1
            else:
                rv0 = np.asarray(ss.tree.visits[:, 0])
                visits0 = int(rv0.min()) if rv0.size else 1
            n_full = max(0, max_visits - visits0 + self.chunk_size - 1) \
                // self.chunk_size
            for _ in range(n_full):
                rng, r = jax.random.split(rng)
                ss = chunk(sp, ss, r, cap, amask, mirror, pattern_bonus)
                chunks_done += 1
        while True:
            if stop_event is not None and stop_event.is_set():
                break
            # always run at least one chunk so an immediately-interrupted
            # analyze still reports a real (if small) search
            if should_stop is not None and chunks_done > 0 and should_stop():
                break
            elapsed = time.time() - t0
            if (time_rec is not None and host_params is not None
                    and chunks_done > 0 and g == 1):
                from katago_tpu.search import timecontrols as TC
                ent, surprise = self._root_entropy_surprise(ss)
                max_time = TC.recompute_search_time_limit(
                    host_params, time_rec, time_max or 0.0,
                    turn_number=turn_number, board_area=self.size ** 2,
                    policy_entropy=ent, policy_surprise=surprise)
            if max_time is not None and elapsed >= max_time:
                break
            rv = np.asarray(ss.tree.visits[:, 0])
            visits_done = bool(((rv >= int(cap)) |
                                ~np.asarray(amask)).all())
            if visits_done and elapsed >= min_time:
                break
            if (host_params is not None and max_time is not None
                    and getattr(host_params, "futile_visits_threshold",
                                0.0) > 0 and g == 1 and chunks_done > 0
                    and elapsed >= 0.1
                    and self._futile_stop(ss, host_params, elapsed,
                                          max_time, turn_number)):
                break
            rng, r = jax.random.split(rng)
            ss = chunk(sp, ss, r, cap, amask, mirror, pattern_bonus)
            chunks_done += 1
            if callback is not None:
                now = time.time()
                if now - last_cb >= callback_interval:
                    last_cb = now
                    callback(self.collect_fn()(ss), now - t0)
        return self.collect_fn()(ss)


    # -- dynamic time-management helpers (host side, g == 1) ----------

    def _root_entropy_surprise(self, ss):
        """Root policy entropy and search surprise
        (Search::getPolicySurpriseAndEntropy): entropy of the raw root
        prior, and the KL-ish surprise of the visit distribution
        relative to it."""
        prior = np.asarray(ss.tree.policy[0, 0, :]).astype(np.float32)
        legal = prior >= 0
        p = np.where(legal, np.maximum(prior, 1e-30), 0.0)
        p = p / max(p.sum(), 1e-30)
        ent = float(-(p[legal] * np.log(np.maximum(p[legal], 1e-30))).sum())
        children = np.asarray(ss.tree.children[0, 0, :])
        visits = np.asarray(ss.tree.visits[0])
        cv = np.where(children >= 0,
                      visits[np.maximum(children, 0)], 0).astype(np.float64)
        tot = cv.sum()
        if tot <= 0:
            return ent, 0.0
        q = cv / tot
        nzq = q > 0
        surprise = float((q[nzq] * (np.log(q[nzq]) -
                                    np.log(np.maximum(p[nzq], 1e-30)))).sum())
        return ent, max(surprise, 0.0)

    def _futile_stop(self, ss, hp, elapsed, planned, turn_number) -> bool:
        """futileVisitsThreshold early stop
        (searchtimehelpers.cpp:97-140): once the best-by-visits move is
        also best-by-selection and no alternative can reach the
        non-futile visit requirement in the time left, stop."""
        from katago_tpu.search import timecontrols as TC
        root_visits = float(np.asarray(ss.tree.visits[0, 0]))
        if root_visits <= 1:
            return False
        ub_left = (planned - elapsed) / max(elapsed, 1e-9) * root_visits
        children = np.asarray(ss.tree.children[0, 0, :])
        visits = np.asarray(ss.tree.visits[0])
        cv = np.where(children >= 0,
                      visits[np.maximum(children, 0)], 0).astype(np.float64)
        if cv.sum() <= 0:
            return False
        best = int(cv.argmax())
        required = TC.num_visits_needed_to_be_non_futile(
            hp, cv[best], turn_number, self.size ** 2)
        if ub_left >= required:
            return False
        alt = np.delete(cv, best)
        return bool((alt + ub_left < required).all())


class AsyncSearch:
    """Background search thread — the reference's AsyncBot pondering
    (asyncbot.h:72-135). Start a driver.search on a position; stop() joins
    and returns the final result (whose tree the caller can reuse)."""

    def __init__(self, driver: SearchDriver, roots, rng, **kwargs):
        self._stop = threading.Event()
        self._result = None

        def run():
            self._result = driver.search(roots, rng,
                                         stop_event=self._stop, **kwargs)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> mcts.SearchResult | None:
        self._stop.set()
        self._thread.join()
        return self._result

    @property
    def running(self) -> bool:
        return self._thread.is_alive()
