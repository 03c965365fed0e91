"""Array-MCTS: batched tree search over a device-resident node pool.

TPU-native replacement for cpp/search/ (search.cpp runWholeSearch /
playoutDescend, searchnode.h's atomic node machinery, ~11.8k LoC of
thread-per-playout C++). The reference parallelizes one tree across CPU
threads with virtual loss and a batching NN server; here the parallelism is
inverted — G independent games run one playout each in lockstep, so every
NN evaluation is naturally a [G]-batch and no queues, locks, or virtual
losses exist.

Structure per game (vmapped over the batch):
  * node pool: PosState arrays [N, ...] + tree topology (children [N, A]
    int32) + statistics (visits/weight/utility sums) + per-node NN memo.
  * one playout = select (PUCT descent along the tree) -> expand (board
    step + featurize + NN forward, batched across games) -> backup
    (scatter-add along the recorded path).
  * superko along the search path: leaf legality is computed against the
    root game's ko-hash history with the path's hashes appended, so node
    priors are already superko-masked (the reference discovers these
    lazily in playoutDescend).

Formulas follow cpp/search/searchexplorehelpers.cpp exactly:
  exploreScaling = (cpuctExploration + cpuctExplorationLog *
        log((W_children + base)/base)) * sqrt(W_children + 0.01) * stdevFactor
  selection value = exploreScaling * P[a] / (1 + W_child) +- Q_child
  FPU = parentUtility (optionally mixed with the node's own NN utility)
        -+ fpuReductionMax * sqrt(visited policy mass), mixed toward loss
Utilities are tracked from White's perspective; the mover flips sign at
selection time (searchexplorehelpers.cpp:38-54).
"""

from __future__ import annotations

import functools
import os as _os
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import benson
from katago_tpu.game import board as B
from katago_tpu.game import graphhash as GH
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.models import features as F
from katago_tpu.ops import symmetry as SYM
from katago_tpu.search.params import SearchParamsArr

TOTALCHILDWEIGHT_PUCT_OFFSET = 0.01
ILLEGAL = -1e30

# Pool dtypes: the [N, A] topology/prior arrays dominate tree-pool HBM
# traffic (gathers + the layout copies XLA inserts around scatters), so
# they store narrow: child indices as int16 when the pool fits (int32
# otherwise — `child_dt(max_nodes)`), priors as float16 (same width as
# the reference's float16 policyProbs, nnoutput.h; float16's 11-bit
# mantissa beats bfloat16's 8 for priors in [0,1]). -1 sentinels are
# exact in both.
CHILD_DT = jnp.int16
POL_DT = jnp.float16


def child_dt(max_nodes: int):
    """Child-index dtype for a pool of `max_nodes` nodes: int16 while
    indices fit (the common case), int32 for the huge-visit pools a GTP
    `kata-set-param maxVisits 20000`-style override can build."""
    return jnp.int16 if max_nodes < 2 ** 15 else jnp.int32


def ladder_map_chase_fn(stones, size, ko_loc):
    from katago_tpu.game import ladder
    return ladder.ladder_map_chase(stones, size, ko_loc=ko_loc).laddered


def ladder_map_fn(stones, size, ko_loc):
    from katago_tpu.game import ladder
    return ladder.ladder_map(stones, size, ko_loc=ko_loc).laddered


# Column layout of Tree.stats — the per-node float statistics live in ONE
# stacked f32[N, NUM_STATS] array so the hot paths (PUCT select, node
# recompute, leaf insertion) touch the pool with a single gather/scatter
# instead of ~18 per-field ops: on TPU every [G, N]-shaped op costs
# roughly the same regardless of width, so op COUNT is the cost model.
C_WEIGHT_SUM = 0          # total backup weight
C_UTILITY_SUM = 1         # white-perspective utility * weight
C_UTILITY_SQ_SUM = 2
C_WINLOSS_SUM = 3         # white-perspective
C_SCORE_MEAN_SUM = 4
C_SCORE_MEANSQ_SUM = 5    # for variance-aware score utility
C_LEAD_SUM = 6
C_WEIGHT_SQ_SUM = 7       # for LCB effective sample size
C_NN_UTILITY = 8          # this node's own NN eval
C_NN_WINLOSS = 9
C_NN_SCORE_MEAN = 10
C_NN_SCORE_MEANSQ = 11
C_NN_SCORE_STDEV = 12
C_NN_LEAD = 13
C_NN_WEIGHT = 14          # uncertainty weight of own eval
C_LAST_BIAS_DELTA = 15    # node's last subtree-value-bias contribution
C_LAST_BIAS_WEIGHT = 16
C_PATTERN_BONUS = 17      # avoid-repeated-shapes white-utility bonus of
                          # the node's move (searchnode.h:183)
NUM_STATS = 18


class Tree(NamedTuple):
    """Single-game node pool; every array's leading dim is max_nodes.

    Float per-node statistics are stacked in `stats` (see C_* columns);
    the named accessors below keep read sites source-compatible."""
    pos: H.PosState              # per-node position ([N, ...] leaves)
    ko_hash: jax.Array           # uint32[N, 2] node's superko hash
    graph_hash: jax.Array        # uint32[N, 2] MCGS transposition key
                                 # (graphhash.cpp: path-dependent inside
                                 # cramped regions, state-pure elsewhere)
    parent: jax.Array            # int32[N]
    parent_action: jax.Array     # int32[N]
    depth: jax.Array             # int32[N]
    children: jax.Array          # int32[N, A], -1 = none
    policy: jax.Array            # float32[N, A], -1 = illegal
    visits: jax.Array            # int32[N]
    stats: jax.Array             # float32[N, NUM_STATS] (C_* columns)
    bias_key: jax.Array          # int32[N] subtree-value-bias table slot (-1)
    laddered: jax.Array          # bool[N, NN] this node's plane-14 ladder
                                 # mask — cached so child evals reuse it for
                                 # planes 15/16 instead of re-solving the
                                 # parent/grandparent boards (the dominant
                                 # featurizer cost, 3 solves -> 1)
    term_own: jax.Array          # int8[N, NN] exact final-area ownership of
                                 # game-over nodes (white persp, +-1/0),
                                 # cached at insertion so terminal revisits
                                 # need no re-scoring; 0 for live nodes
    best_action: jax.Array       # int32[N] cached PUCT-argmax action,
                                 # refreshed whenever a backup (or policy
                                 # edit) changes the node — descent follows
                                 # it instead of re-evaluating PUCT per
                                 # level (select_path docstring)
    num_nodes: jax.Array         # int32 scalar

    @property
    def weight_sum(self):
        return self.stats[..., C_WEIGHT_SUM]

    @property
    def utility_sum(self):
        return self.stats[..., C_UTILITY_SUM]

    @property
    def utility_sq_sum(self):
        return self.stats[..., C_UTILITY_SQ_SUM]

    @property
    def winloss_sum(self):
        return self.stats[..., C_WINLOSS_SUM]

    @property
    def score_mean_sum(self):
        return self.stats[..., C_SCORE_MEAN_SUM]

    @property
    def score_meansq_sum(self):
        return self.stats[..., C_SCORE_MEANSQ_SUM]

    @property
    def lead_sum(self):
        return self.stats[..., C_LEAD_SUM]

    @property
    def weight_sq_sum(self):
        return self.stats[..., C_WEIGHT_SQ_SUM]

    @property
    def nn_utility(self):
        return self.stats[..., C_NN_UTILITY]

    @property
    def nn_winloss(self):
        return self.stats[..., C_NN_WINLOSS]

    @property
    def nn_score_mean(self):
        return self.stats[..., C_NN_SCORE_MEAN]

    @property
    def nn_score_meansq(self):
        return self.stats[..., C_NN_SCORE_MEANSQ]

    @property
    def nn_score_stdev(self):
        return self.stats[..., C_NN_SCORE_STDEV]

    @property
    def nn_lead(self):
        return self.stats[..., C_NN_LEAD]

    @property
    def nn_weight(self):
        return self.stats[..., C_NN_WEIGHT]

    @property
    def last_bias_delta(self):
        return self.stats[..., C_LAST_BIAS_DELTA]

    @property
    def last_bias_weight(self):
        return self.stats[..., C_LAST_BIAS_WEIGHT]

    @property
    def pattern_bonus(self):
        return self.stats[..., C_PATTERN_BONUS]


BIAS_TABLE_SIZE = 2048  # subtree-value-bias slots per game (65536 shards
                        # of maps in the reference, subtreevaluebiastable.h)


class SearchState(NamedTuple):
    """Tree + per-game search context."""
    tree: Tree
    rules: H.RulesArr
    root_hist: jax.Array         # uint32[MAX_HIST, 2] game history before root
    root_hist_len: jax.Array     # int32
    dyn_score_center: jax.Array  # float32
    sqrt_board_area: jax.Array   # float32
    bias_sum: jax.Array          # f32[BIAS_TABLE_SIZE] delta-utility sums
    bias_weight: jax.Array       # f32[BIAS_TABLE_SIZE]
    own_sum: jax.Array           # f32[NN] weighted NN-ownership sum over
                                 # playout leaves (white persp; the
                                 # tree-averaged ownership of
                                 # searchresults.cpp getAverageTreeOwnership)
    own_sq_sum: jax.Array        # f32[NN] weighted squared-ownership sum
                                 # (ownershipStdev, GTP_Extensions.md)
    own_weight: jax.Array        # f32
    ending_bonus: jax.Array      # f32[A] white-persp per-root-move score
                                 # bonus (getEndingWhiteScoreBonus,
                                 # searchhelpers.cpp:351-420); zeros when
                                 # rootEndingBonusPoints is 0
    root_prev_laddered: jax.Array  # bool[NN] ladder mask of the board one
                                 # move BEFORE the root — the grandparent
                                 # board of depth-1 leaves (tree.laddered
                                 # covers every in-tree board)
    mo_sum: jax.Array            # f32[A, NN] per-root-move weighted
                                 # ownership sums (includeMovesOwnership,
                                 # analysis.cpp; [1, 1] dummies unless
                                 # init_search(track_moves_ownership=True))
    mo_sq_sum: jax.Array         # f32[A, NN] (includeMovesOwnershipStdev)
    mo_weight: jax.Array         # f32[A]


class LeafEval(NamedTuple):
    """Per-game NN (or terminal) evaluation of this playout's leaf."""
    utility: jax.Array
    winloss: jax.Array
    score_mean: jax.Array
    score_meansq: jax.Array
    score_stdev: jax.Array
    lead: jax.Array
    policy: jax.Array            # f32[A] prior (-1 illegal)
    weight: jax.Array            # f32 backup weight (uncertainty-scaled)
    ownership: jax.Array         # f32[NN] white-persp ownership in [-1, 1]


def empty_tree(size: int, max_nodes: int) -> Tree:
    nn = size * size
    a = nn + 1
    n = max_nodes
    pos1 = H.new_pos(size)
    pos = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), pos1)
    return Tree(
        pos=pos,
        ko_hash=jnp.zeros((n, 2), jnp.uint32),
        graph_hash=jnp.zeros((n, 2), jnp.uint32),
        parent=jnp.full((n,), -1, jnp.int32),
        parent_action=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        children=jnp.full((n, a), -1, child_dt(n)),
        policy=jnp.full((n, a), -1.0, POL_DT),
        visits=jnp.zeros((n,), jnp.int32),
        stats=jnp.zeros((n, NUM_STATS), jnp.float32),
        bias_key=jnp.full((n,), -1, jnp.int32),
        laddered=jnp.zeros((n, nn), bool),
        term_own=jnp.zeros((n, nn), jnp.int8),
        best_action=jnp.zeros((n,), jnp.int32),
        num_nodes=jnp.int32(0),
    )


def score_value(score_white: jax.Array, center: jax.Array,
                scale: jax.Array, sqrt_area: jax.Array) -> jax.Array:
    """ScoreValue::whiteScoreValueOfScoreSmoothNoDrawAdjust (nninputs.cpp:59)."""
    return jnp.arctan((score_white - center) / (scale * sqrt_area)) * (2.0 / jnp.pi)


# 5-point Gauss-Hermite quadrature for E[f(N(mean, var))], replacing the
# reference's precomputed expectedWhiteScoreValue tables (nninputs.cpp:161).
_GH_X, _GH_W = np.polynomial.hermite.hermgauss(5)
_GH_W = _GH_W / np.sqrt(np.pi)


def expected_score_value(mean, meansq, center, scale, sqrt_area):
    """E[SV(s)] for s ~ Normal(mean, meansq - mean^2)."""
    var = jnp.maximum(meansq - mean * mean, 0.0)
    sigma = jnp.sqrt(var)
    total = 0.0
    for x, w in zip(_GH_X, _GH_W):
        s = mean + np.sqrt(2.0) * float(x) * sigma
        total = total + float(w) * score_value(s, center, scale, sqrt_area)
    return total


def utility_of(winloss_white, score_mean_white, score_meansq_white,
               sp: SearchParamsArr, dyn_center, sqrt_area) -> jax.Array:
    """winLoss + static + dynamic score utility, variance-aware
    (searchupdatehelpers.cpp:24, Search::getScoreUtility)."""
    static_sv = expected_score_value(score_mean_white, score_meansq_white,
                                     jnp.float32(0.0), jnp.float32(1.0),
                                     sqrt_area)
    dyn_sv = expected_score_value(score_mean_white, score_meansq_white,
                                  dyn_center, sp.dynamic_score_center_scale,
                                  sqrt_area)
    return (sp.win_loss_utility_factor * winloss_white
            + sp.static_score_utility_factor * static_sv
            + sp.dynamic_score_utility_factor * dyn_sv)


def score_utility_derivative(score_mean, sp: SearchParamsArr, dyn_center,
                             sqrt_area):
    """d(scoreUtility)/d(scoreMean) — for uncertainty weighting
    (Search::getApproxScoreUtilityDerivative)."""
    def dsv(center, scale):
        k = scale * sqrt_area
        d = score_mean - center
        return (2.0 / jnp.pi) * k / (k * k + d * d)

    return (sp.static_score_utility_factor * dsv(0.0, jnp.float32(1.0))
            + sp.dynamic_score_utility_factor *
            dsv(dyn_center, sp.dynamic_score_center_scale))


def uncertainty_weight(shortterm_wl_error, shortterm_score_error, score_mean,
                       sp: SearchParamsArr, dyn_center, sqrt_area):
    """Search::computeWeightFromNNOutput (searchupdatehelpers.cpp:114-136)."""
    uncertainty = (sp.win_loss_utility_factor * shortterm_wl_error
                   + score_utility_derivative(score_mean, sp, dyn_center,
                                              sqrt_area)
                   * shortterm_score_error)
    powered = jnp.power(jnp.maximum(uncertainty, 1e-10),
                        sp.uncertainty_exponent)
    baseline = sp.uncertainty_coeff / sp.uncertainty_max_weight
    w = sp.uncertainty_coeff / (powered + baseline)
    return jnp.where(sp.use_uncertainty, w, 1.0)


def _white_persp(x_mover: jax.Array, to_move: jax.Array) -> jax.Array:
    """Flip a mover-perspective value to White's perspective."""
    return jnp.where(to_move == B.WHITE, x_mover, -x_mover)


def _puct_terms(nstats, pol, has_child, cw, cu, pla, is_root, ending_bonus,
                dyn_center, sqrt_area, sp: SearchParamsArr):
    """PUCT selection terms of one node (searchexplorehelpers.cpp formulas;
    see select_path docstring). nstats: the node's f32[NUM_STATS] row;
    cw/cu: per-action child weight sums and average utilities (0 where no
    child). Returns (explore_comp [A], value_comp [A]); the selection
    score is their sum where pol >= 0.

    Factored out so the SAME formula runs in three places: classic
    descent-time selection (the anti-mirror path), backup-time
    `best_action` refresh (recompute_node — the fast-descent cache), and
    single-node refreshes after a policy edit (superko marking)."""
    total_cw = jnp.sum(cw)
    visited_mass = jnp.sum(jnp.where(has_child & (pol >= 0), pol, 0.0))

    w = jnp.maximum(nstats[C_WEIGHT_SUM], 1e-10)
    parent_utility = nstats[C_UTILITY_SUM] / w
    utility_sq_avg = nstats[C_UTILITY_SQ_SUM] / w
    # parent utility stdev factor (searchexplorehelpers.cpp:265-300)
    var_prior = sp.cpuct_utility_stdev_prior ** 2
    var_prior_w = sp.cpuct_utility_stdev_prior_weight
    u_sq = parent_utility * parent_utility
    usq = jnp.maximum(utility_sq_avg, u_sq)
    stdev = jnp.sqrt(jnp.maximum(
        ((u_sq + var_prior) * var_prior_w + usq * w)
        / (var_prior_w + jnp.maximum(w - 1.0, 1e-10)) - u_sq, 0.0))
    stdev = jnp.where(w <= 1.0, sp.cpuct_utility_stdev_prior, stdev)
    stdev_factor = 1.0 + sp.cpuct_utility_stdev_scale * (
        stdev / sp.cpuct_utility_stdev_prior - 1.0)

    fpu_red = jnp.where(is_root, sp.root_fpu_reduction_max,
                        sp.fpu_reduction_max)
    fpu_loss = jnp.where(is_root, sp.root_fpu_loss_prop, sp.fpu_loss_prop)
    parent_u_fpu = (sp.fpu_parent_weight * nstats[C_NN_UTILITY]
                    + (1.0 - sp.fpu_parent_weight) * parent_utility)
    utility_radius = (sp.win_loss_utility_factor
                      + sp.static_score_utility_factor
                      + sp.dynamic_score_utility_factor)
    is_white = pla == B.WHITE
    reduction = fpu_red * jnp.sqrt(visited_mass)
    fpu = jnp.where(is_white, parent_u_fpu - reduction,
                    parent_u_fpu + reduction)
    loss_value = jnp.where(is_white, -utility_radius, utility_radius)
    fpu = fpu + (loss_value - fpu) * fpu_loss

    cpuct = sp.cpuct_exploration + sp.cpuct_exploration_log * jnp.log(
        (total_cw + sp.cpuct_exploration_base) / sp.cpuct_exploration_base)
    explore_scaling = cpuct * jnp.sqrt(
        total_cw + TOTALCHILDWEIGHT_PUCT_OFFSET) * stdev_factor

    child_util = jnp.where(has_child, cu, fpu)
    # root ending bonus -> utility via the score-utility derivative
    # at the parent's average score (searchhelpers.cpp:587-589)
    parent_score = nstats[C_SCORE_MEAN_SUM] / w
    deriv = score_utility_derivative(parent_score, sp, dyn_center, sqrt_area)
    child_util = child_util + jnp.where(is_root, ending_bonus * deriv, 0.0)
    value_comp = jnp.where(is_white, child_util, -child_util)
    explore_comp = explore_scaling * pol / (1.0 + cw)
    return explore_comp, value_comp


def node_best_action(tree: Tree, node: jax.Array, sp: SearchParamsArr,
                     ending_bonus, dyn_center, sqrt_area,
                     nstats=None) -> jax.Array:
    """Recompute the PUCT-argmax action of `node` from its current stats
    (the fast-descent cache entry; see Tree.best_action). nstats: optional
    override row (recompute_node passes the freshly recomputed row)."""
    children = tree.children[node]                     # [A]
    pol = tree.policy[node]
    has_child = children >= 0
    cidx = jnp.maximum(children, 0)
    cstats = tree.stats[cidx]                          # [A, NUM_STATS]
    if nstats is None:
        nstats = tree.stats[node]
    cw = jnp.where(has_child, cstats[:, C_WEIGHT_SUM], 0.0)
    cu = jnp.where(has_child,
                   cstats[:, C_UTILITY_SUM] / jnp.maximum(cw, 1e-10), 0.0)
    explore, value = _puct_terms(
        nstats, pol, has_child, cw, cu, tree.pos.to_move[node],
        node == 0, ending_bonus, dyn_center, sqrt_area, sp)
    score = jnp.where(pol >= 0, explore + value, ILLEGAL)
    return jnp.argmax(score).astype(jnp.int32)


def leaf_best_action(leaf_row: jax.Array, pol: jax.Array, pla: jax.Array,
                     sp: SearchParamsArr, dyn_center,
                     sqrt_area) -> jax.Array:
    """best_action of a freshly inserted childless leaf (all actions at
    FPU; equals the full formula with zero child weight)."""
    a = pol.shape[0]
    zeros = jnp.zeros((a,), jnp.float32)
    explore, value = _puct_terms(
        leaf_row, pol, jnp.zeros((a,), bool), zeros, zeros, pla,
        jnp.bool_(False), zeros, dyn_center, sqrt_area, sp)
    score = jnp.where(pol >= 0, explore + value, ILLEGAL)
    return jnp.argmax(score).astype(jnp.int32)


class PathSel(NamedTuple):
    path_nodes: jax.Array    # int32[MAX_DEPTH] (-1 pad)
    path_len: jax.Array      # int32: number of valid path entries
    leaf_parent: jax.Array   # int32 node to expand from (or terminal node)
    leaf_action: jax.Array   # int32 action to expand (-1 if terminal/revisit)
    is_terminal: jax.Array   # bool: leaf is a finished game (or depth cap)
    terminal_node: jax.Array  # int32
    root_action: jax.Array   # int32 first action of the descent (-1 when
    #                          the playout dies at the root itself) — the
    #                          root child this playout's leaf eval belongs
    #                          to (includeMovesOwnership attribution)


def select_path(ss: SearchState, sp: SearchParamsArr, max_depth: int,
                mirror=None) -> PathSel:
    """PUCT descent from the root; single game (vmap over batch).

    Descent follows each node's CACHED best_action (recomputed whenever a
    backup changes the node's stats — see Tree.best_action), so each level
    costs a couple of pointer reads instead of the full child-stats gather
    + PUCT evaluation; node stats only change through recompute-backups,
    so the cache is exactly as fresh as evaluating PUCT at descent time
    (modulo graph-search transposition staleness the reference shares,
    GraphSearch.md).

    mirror: optional per-game anti-mirror verdict (search/mirror.py
    MirrorArrs row) — when set, mirror replies and center refutations get
    forced-explore utility bumps (searchmirror.cpp:156-278), which depend
    on descent-time context, so the classic full-PUCT descent runs
    instead."""
    tree = ss.tree

    def puct_action(node):
        # classic descent-time PUCT (anti-mirror path only)
        children = tree.children[node]                     # [A]
        pol = tree.policy[node]                            # [A]
        has_child = children >= 0
        cidx = jnp.maximum(children, 0)
        cstats = tree.stats[cidx]                          # [A, NUM_STATS]
        nstats = tree.stats[node]                          # [NUM_STATS]
        cw = jnp.where(has_child, cstats[:, C_WEIGHT_SUM], 0.0)
        cu = jnp.where(has_child,
                       cstats[:, C_UTILITY_SUM] / jnp.maximum(cw, 1e-10),
                       0.0)
        pla = tree.pos.to_move[node]
        is_root = node == 0
        explore_comp, value_comp = _puct_terms(
            nstats, pol, has_child, cw, cu, pla, is_root, ss.ending_bonus,
            ss.dyn_score_center, ss.sqrt_board_area, sp)
        if mirror is not None:
            from katago_tpu.search import mirror as MIR
            size_ = int(np.sqrt(tree.policy.shape[1] - 1))
            w = jnp.maximum(nstats[C_WEIGHT_SUM], 1e-10)
            parent_utility = nstats[C_UTILITY_SUM] / w
            is_white = pla == B.WHITE
            total_cw = jnp.sum(cw)
            pu_self = jnp.where(is_white, parent_utility, -parent_utility)
            value_comp = MIR.puct_adjust(
                value_comp, pol, tree.pos.recent_moves[node, 0], pla, cw,
                total_cw, pu_self, tree.pos.board.stones[node], is_root,
                mirror.mirroring, mirror.mirror_pla, mirror.advantage,
                mirror.center_err, tree.pos.to_move[0], size_)
        score = jnp.where(pol >= 0, explore_comp + value_comp, ILLEGAL)
        return jnp.argmax(score).astype(jnp.int32)

    if mirror is None:
        puct_action = lambda node: tree.best_action[node]  # noqa: E731

    def loop_cond(carry):
        i, state = carry
        done = state[1]
        return (i < max_depth) & ~done

    def body(i, carry):
        cur, done, path_nodes, path_len, leaf_parent, leaf_action, \
            is_terminal, terminal_node, root_action = carry
        # a finished-game node (or the depth cap) terminates the playout
        hit_terminal = ~done & tree.pos.game_over[cur]
        a = puct_action(cur)
        child = tree.children[cur, a]
        expanding = ~done & ~hit_terminal & (child < 0)
        descending = ~done & ~hit_terminal & (child >= 0)

        path_nodes = path_nodes.at[i].set(jnp.where(~done, cur, -1))
        path_len = jnp.where(~done, i + 1, path_len)
        leaf_parent = jnp.where(expanding, cur, leaf_parent)
        leaf_action = jnp.where(expanding, a, leaf_action)
        is_terminal = is_terminal | hit_terminal
        terminal_node = jnp.where(hit_terminal, cur, terminal_node)
        root_action = jnp.where((i == 0) & (expanding | descending), a,
                                root_action)
        done = done | hit_terminal | expanding
        cur = jnp.where(descending, jnp.maximum(child, 0), cur)
        return (cur, done, path_nodes, path_len, leaf_parent, leaf_action,
                is_terminal, terminal_node, root_action)

    init = (jnp.int32(0), jnp.bool_(False),
            jnp.full((max_depth,), -1, jnp.int32), jnp.int32(0),
            jnp.int32(0), jnp.int32(-1), jnp.bool_(False), jnp.int32(0),
            jnp.int32(-1))
    # two levels per trip (body is done-masked, so a finished lane's
    # second step is a no-op); max_depth stays exact for even caps
    assert max_depth % 2 == 0, "max_depth must be even (2 levels/trip)"
    _, (cur, done, path_nodes, path_len, leaf_parent, leaf_action,
        is_terminal, terminal_node, root_action) = jax.lax.while_loop(
        loop_cond, lambda c: (c[0] + 2, body(c[0] + 1, body(c[0], c[1]))),
        (jnp.int32(0), init))
    # depth cap without resolution: treat current node as terminal-revisit
    is_terminal = is_terminal | ~done
    terminal_node = jnp.where(~done, cur, terminal_node)
    return PathSel(path_nodes, path_len, leaf_parent, leaf_action,
                   is_terminal, terminal_node, root_action)


def make_leaf_gamestate(ss: SearchState, sel: PathSel, size: int,
                        max_depth: int) -> tuple[H.PosState, jax.Array, H.GameState]:
    """Step the expansion move and assemble a GameState whose history =
    root game history + search-path hashes (for superko + features)."""
    tree = ss.tree
    parent_pos = jax.tree.map(lambda a: a[sel.leaf_parent], tree.pos)
    nn = size * size
    action = jnp.where(sel.is_terminal, jnp.int32(nn),
                       jnp.maximum(sel.leaf_action, 0))
    leaf_pos, _, leaf_ko_hash = H.step_pos(parent_pos, ss.rules, action, size)

    # assemble history: root hist + hashes of path nodes (skip root: already
    # the last entry of root hist) + leaf hash
    max_hist = ss.root_hist.shape[0]
    hist = ss.root_hist
    path_idx = jnp.maximum(sel.path_nodes, 0)
    path_hashes = tree.ko_hash[path_idx]                       # [D, 2]
    path_valid = (sel.path_nodes > 0)                          # exclude root
    order = jnp.cumsum(path_valid.astype(jnp.int32)) - 1
    write_at = jnp.where(path_valid,
                         jnp.minimum(ss.root_hist_len + order, max_hist - 1),
                         max_hist - 1)
    # scatter path hashes; collisions only at the clamp boundary (benign)
    hist = hist.at[write_at].set(jnp.where(path_valid[:, None], path_hashes,
                                           hist[write_at]))
    hist_len = jnp.minimum(ss.root_hist_len + jnp.sum(path_valid), max_hist)
    # leaf hash recorded too
    leaf_write = jnp.minimum(hist_len, max_hist - 1)
    hist = hist.at[leaf_write].set(leaf_ko_hash)
    hist_len = jnp.minimum(hist_len + 1, max_hist)

    # pass-hash rings are not reconstructed along the search path:
    # spight-like pass endings inside the tree are approximated by
    # consecutive-pass counting (see history.py module docstring)
    p = H.MAX_PASS_HASHES
    leaf_gs = H.GameState(pos=leaf_pos, rules=ss.rules,
                          ko_hash_hist=hist, hist_len=hist_len,
                          pass_hash_black=jnp.zeros((p, 2), jnp.uint32),
                          pass_hash_black_n=jnp.int32(0),
                          pass_hash_white=jnp.zeros((p, 2), jnp.uint32),
                          pass_hash_white_n=jnp.int32(0))
    return leaf_pos, leaf_ko_hash, leaf_gs


def _bias_key(parent_stones, prev_move, move_loc, pla, ko_loc, size: int):
    """Subtree-value-bias table slot for a node reached by playing move_loc
    as pla on the parent board: 5x5 local-pattern zobrist around the move
    XOR move-loc keys for this and the previous move XOR the parent's
    simple-ko-ban key (SubtreeValueBiasTable::get,
    subtreevaluebiastable.cpp:62-68 with the 5x5 hasher of line 19; the
    atari keys are skipped in-search — liberties would cost a fixpoint per
    eval). The 64-bit hash is folded onto BIAS_TABLE_SIZE slots (the
    reference buckets into numShards maps keyed by the full hash)."""
    nn = size * size
    from katago_tpu.search import localpattern as LPAT
    h = LPAT.local_pattern_hash(parent_stones, move_loc, pla, size, 5)
    mt = jnp.asarray(_bias_move_tables(size))          # [2, NN+2, 2]
    h = jnp.bitwise_xor(h, mt[0, jnp.clip(prev_move, -1, nn) + 1])
    h = jnp.bitwise_xor(h, mt[1, jnp.clip(move_loc, -1, nn) + 1])
    kt = jnp.asarray(_bias_ko_table(size))             # [NN+1, 2]
    h = jnp.bitwise_xor(h, kt[jnp.clip(ko_loc, -1, nn - 1) + 1])
    valid = (move_loc >= 0) & (move_loc < nn)
    slot = ((h[0] ^ h[1]) % jnp.uint32(BIAS_TABLE_SIZE)).astype(jnp.int32)
    return jnp.where(valid, slot, -1)


@functools.lru_cache(maxsize=None)
def _bias_move_tables(size: int) -> np.ndarray:
    """ZOBRIST_MOVE_LOCS[loc][0/1] analogue: uint32[2, NN+2, 2], row 0 for
    the parent's previous move, row 1 for this node's move; slot 0 is the
    no-move (-1) key."""
    rng = np.random.Generator(np.random.PCG64(0x62696173 + size))
    return rng.integers(0, 2**32, size=(2, size * size + 2, 2),
                        dtype=np.uint32)


@functools.lru_cache(maxsize=None)
def _bias_ko_table(size: int) -> np.ndarray:
    """ZOBRIST_KO_BAN analogue: uint32[NN+1, 2]; slot 0 = no ko (its key is
    zero so no-ko contributes nothing, like the reference's NULL_LOC
    guard)."""
    rng = np.random.Generator(np.random.PCG64(0x6B6F62 + size))
    t = rng.integers(0, 2**32, size=(size * size + 1, 2), dtype=np.uint32)
    t[0] = 0
    return t


def terminal_eval_of_pos(pos: H.PosState, rules: H.RulesArr,
                         sp: SearchParamsArr, size: int, dyn_center,
                         sqrt_area, num_actions: int) -> LeafEval:
    """Exact final-score values of a finished position (the reference's
    terminal playout values)."""
    own, white_minus_black = H.final_score_area_pos(pos, rules, size)
    winloss = jnp.sign(white_minus_black)
    meansq = white_minus_black * white_minus_black
    util = utility_of(winloss, white_minus_black, meansq, sp,
                      dyn_center, sqrt_area)
    return LeafEval(utility=util, winloss=winloss,
                    score_mean=white_minus_black, score_meansq=meansq,
                    score_stdev=jnp.float32(0.0), lead=white_minus_black,
                    policy=jnp.full((num_actions,), -1.0, jnp.float32),
                    weight=jnp.float32(1.0),
                    ownership=-own.astype(jnp.float32))


def terminal_eval(ss: SearchState, node: jax.Array, sp: SearchParamsArr,
                  size: int) -> LeafEval:
    """Utility backed up when a playout ends at an existing node.

    Finished game -> exact final-score values, read from the node's CACHED
    insertion-time evaluation (its C_NN_* stats columns were written from
    terminal_eval_of_pos when the node was created, and term_own holds the
    exact area ownership) — re-scoring the position every sim cost a full
    Benson + labels fixpoint chain per playout. Utility is recomputed from
    the cached winloss/score so the current search's dynamic score center
    applies. Depth-capped playout on a live node -> the node's current
    averaged stats (a weight-1 revisit, value-neutral).
    """
    tree = ss.tree
    nstats = tree.stats[node]
    w = jnp.maximum(nstats[C_WEIGHT_SUM], 1e-10)
    is_over = tree.pos.game_over[node]
    winloss = jnp.where(is_over, nstats[C_NN_WINLOSS],
                        nstats[C_WINLOSS_SUM] / w)
    score = jnp.where(is_over, nstats[C_NN_SCORE_MEAN],
                      nstats[C_SCORE_MEAN_SUM] / w)
    meansq = jnp.where(is_over, nstats[C_NN_SCORE_MEANSQ],
                       nstats[C_SCORE_MEANSQ_SUM] / w)
    lead = jnp.where(is_over, nstats[C_NN_LEAD], nstats[C_LEAD_SUM] / w)
    term_util = utility_of(winloss, score, meansq, sp,
                           ss.dyn_score_center, ss.sqrt_board_area)
    util = jnp.where(is_over, term_util, nstats[C_UTILITY_SUM] / w)
    # depth-capped revisit of a live node: the running tree-average
    # ownership is value-neutral; a finished node contributes exact area
    own_avg = ss.own_sum / jnp.maximum(ss.own_weight, 1e-10)
    ownership = jnp.where(is_over, tree.term_own[node].astype(jnp.float32),
                          own_avg)
    a = tree.policy.shape[1]
    return LeafEval(utility=util, winloss=winloss,
                    score_mean=score, score_meansq=meansq,
                    score_stdev=jnp.float32(0.0),
                    lead=lead,
                    policy=jnp.full((a,), -1.0, jnp.float32),
                    weight=jnp.float32(1.0),
                    ownership=ownership)


def leaf_stats_row(ev: LeafEval, pattern_bonus: jax.Array) -> jax.Array:
    """f32[NUM_STATS] stats row of a freshly-evaluated leaf (its sums are
    just its own uncertainty-weighted evaluation). Column order = C_*."""
    w0 = ev.weight
    z = jnp.zeros((), jnp.float32)
    return jnp.stack([
        w0,                              # C_WEIGHT_SUM
        w0 * ev.utility,                 # C_UTILITY_SUM
        w0 * ev.utility * ev.utility,    # C_UTILITY_SQ_SUM
        w0 * ev.winloss,                 # C_WINLOSS_SUM
        w0 * ev.score_mean,              # C_SCORE_MEAN_SUM
        w0 * ev.score_meansq,            # C_SCORE_MEANSQ_SUM
        w0 * ev.lead,                    # C_LEAD_SUM
        w0 * w0,                         # C_WEIGHT_SQ_SUM
        ev.utility,                      # C_NN_UTILITY
        ev.winloss,                      # C_NN_WINLOSS
        ev.score_mean,                   # C_NN_SCORE_MEAN
        ev.score_meansq,                 # C_NN_SCORE_MEANSQ
        ev.score_stdev,                  # C_NN_SCORE_STDEV
        ev.lead,                         # C_NN_LEAD
        w0,                              # C_NN_WEIGHT
        z,                               # C_LAST_BIAS_DELTA
        z,                               # C_LAST_BIAS_WEIGHT
        jnp.asarray(pattern_bonus, jnp.float32),  # C_PATTERN_BONUS
    ])


def insert_and_backup(ss: SearchState, sel: PathSel, leaf_pos: H.PosState,
                      leaf_ko_hash: jax.Array, ev: LeafEval,
                      superko_illegal: jax.Array, active: jax.Array,
                      sp: SearchParamsArr,
                      pat_bonus: jax.Array | None = None,
                      leaf_laddered: jax.Array | None = None) -> SearchState:
    """Allocate the leaf node (unless terminal/full/illegal) and back up.

    Graph search (MCGS-lite): if an allocated node at the SAME depth already
    holds this position's ko-hash, the expansion links the parent to that
    existing node instead of allocating a duplicate — transpositions share
    one subtree (searchnodetable.{cpp,h} / docs/GraphSearch.md). The
    equal-depth guard keeps the DAG acyclic (every edge goes depth ->
    depth+1), the array analogue of graphhash.h:9-16's repBound cycle
    guard. Stats stay correct because backup is recompute-style: parents
    re-average their children on every path update, which is exactly the
    value-propagation rule GraphSearch.md prescribes for transpositions.
    """
    tree = ss.tree
    n = tree.visits.shape[0]

    would_alloc = (~sel.is_terminal) & (tree.num_nodes < n) \
        & ~superko_illegal & active
    # graph-hash transposition probe (graphhash.cpp getGraphHash): the
    # leaf's key chains from the parent unless the local region around
    # the move bounds out repetition cycles, in which case it is the
    # pure state hash and transpositions merge across depths/move orders
    nn_area = leaf_pos.board.stones.shape[0]
    size_ = int(nn_area ** 0.5)
    action_loc = jnp.where(sel.is_terminal, jnp.int32(nn_area),
                           jnp.maximum(sel.leaf_action, 0))
    state_h = GH.state_hash(leaf_ko_hash, leaf_pos.game_over,
                            leaf_pos.consec_passes)
    reset = GH.simple_repetition_bound_gt(
        leaf_pos.board.stones, size_, action_loc,
        sp.graph_search_rep_bound)
    leaf_graph = GH.graph_hash_step(tree.graph_hash[sel.leaf_parent],
                                    state_h, reset)
    idx = jnp.arange(n, dtype=jnp.int32)
    is_tp = (idx < tree.num_nodes) & \
        jnp.all(tree.graph_hash == leaf_graph[None, :], axis=1)
    tp_idx = jnp.argmax(is_tp).astype(jnp.int32)
    use_tp = sp.use_graph_search & jnp.any(is_tp) & would_alloc

    can_alloc = would_alloc & ~use_tp
    new_idx = jnp.where(can_alloc, tree.num_nodes, n - 1)  # dummy last slot

    def set_at(arr, idx, val):
        return arr.at[idx].set(jnp.where(can_alloc, val, arr[idx]))

    pos = jax.tree.map(
        lambda store, v: store.at[new_idx].set(
            jnp.where(can_alloc, v, store[new_idx])), tree.pos, leaf_pos)
    w0 = ev.weight
    # fresh leaf stats = its own evaluation only — ONE stacked row write
    # (see Tree.stats: per-field scatters each cost a full pool op on TPU)
    leaf_row = leaf_stats_row(
        ev, jnp.float32(0.0) if pat_bonus is None else pat_bonus)
    tree = tree._replace(
        pos=pos,
        ko_hash=set_at(tree.ko_hash, new_idx, leaf_ko_hash),
        graph_hash=set_at(tree.graph_hash, new_idx, leaf_graph),
        parent=set_at(tree.parent, new_idx, sel.leaf_parent),
        parent_action=set_at(tree.parent_action, new_idx, sel.leaf_action),
        depth=set_at(tree.depth, new_idx, tree.depth[sel.leaf_parent] + 1),
        policy=set_at(tree.policy, new_idx, ev.policy.astype(POL_DT)),
        stats=set_at(tree.stats, new_idx, leaf_row),
        bias_key=set_at(
            tree.bias_key, new_idx,
            _bias_key(tree.pos.board.stones[sel.leaf_parent],
                      tree.pos.recent_moves[sel.leaf_parent, 0],
                      sel.leaf_action, tree.pos.to_move[sel.leaf_parent],
                      tree.pos.simple_ko_loc[sel.leaf_parent],
                      int(np.sqrt(tree.policy.shape[1] - 1)))),
        laddered=(tree.laddered if leaf_laddered is None else
                  set_at(tree.laddered, new_idx, leaf_laddered)),
        term_own=set_at(
            tree.term_own, new_idx,
            jnp.where(leaf_pos.game_over, jnp.round(ev.ownership),
                      0.0).astype(jnp.int8)),
        best_action=set_at(
            tree.best_action, new_idx,
            # the pool stores the prior at POL_DT: compute the cached
            # argmax from the SAME rounded values descent-time PUCT reads
            leaf_best_action(leaf_row, ev.policy.astype(POL_DT),
                             leaf_pos.to_move, sp,
                             ss.dyn_score_center, ss.sqrt_board_area)),
        num_nodes=tree.num_nodes + can_alloc.astype(jnp.int32),
    )
    # link parent -> child (fresh node, or the transposed existing node)
    link_idx = jnp.where(use_tp, tp_idx, new_idx)
    children = tree.children.at[sel.leaf_parent, jnp.maximum(sel.leaf_action, 0)].set(
        jnp.where(can_alloc | use_tp, link_idx,
                  tree.children[sel.leaf_parent,
                                jnp.maximum(sel.leaf_action, 0)]
                  ).astype(tree.children.dtype))
    # superko-illegal expansion: mark prior illegal so it's never tried again
    policy = tree.policy.at[sel.leaf_parent, jnp.maximum(sel.leaf_action, 0)].set(
        jnp.where(superko_illegal & ~sel.is_terminal, -1.0,
                  tree.policy[sel.leaf_parent, jnp.maximum(sel.leaf_action, 0)]))
    tree = tree._replace(children=children, policy=policy)
    # the parent's cached argmax may point at the freshly-banned prior; a
    # void playout skips the backprop refresh, so refresh it here
    ban = superko_illegal & ~sel.is_terminal
    ba_parent = node_best_action(tree, sel.leaf_parent, sp,
                                 ss.ending_bonus, ss.dyn_score_center,
                                 ss.sqrt_board_area)
    tree = tree._replace(best_action=tree.best_action.at[sel.leaf_parent].set(
        jnp.where(ban, ba_parent, tree.best_action[sel.leaf_parent])))

    # visits are additive per playout, as in the reference (fetch_add);
    # a transposition hit counts a visit on the shared node
    pad = n - 1
    upd_nodes = jnp.concatenate([
        jnp.where(sel.path_nodes >= 0, sel.path_nodes, pad),
        jnp.where(can_alloc, new_idx, jnp.where(use_tp, tp_idx, pad))[None],
    ])
    valid = jnp.concatenate([sel.path_nodes >= 0, (can_alloc | use_tp)[None]])
    # a superko-rejected expansion backs up nothing — the playout is void
    # (its prior was just marked illegal; the next sim picks another move);
    # inactive games (visit cap reached / caller masked) also back up nothing
    valid = valid & ~superko_illegal & active
    tree = tree._replace(
        visits=tree.visits.at[upd_nodes].add(valid.astype(jnp.int32)))

    # a terminal revisit accumulates weight on the terminal node's own eval
    # (the reference's addLeafValue on terminal playouts); the path recompute
    # below rebuilds its sums from nn_weight * nn_* values.
    bump = sel.is_terminal & ~superko_illegal & active
    tnode = jnp.where(bump, sel.terminal_node, pad)
    wb = jnp.where(bump, ev.weight, 0.0)
    tree = tree._replace(
        stats=tree.stats.at[tnode, C_NN_WEIGHT].add(wb))

    # recompute stats bottom-up along the path (Search::recomputeNodeStats):
    # each node's stats become the value-weighted average of its children
    # plus its own uncertainty-weighted NN evaluation.
    ss = ss._replace(tree=tree)
    ss = backprop_path(ss, sel, sp, ~superko_illegal & active)
    return ss


def _norm_cdf(z):
    return 0.5 * (1.0 + jax.lax.erf(z / np.sqrt(2.0)))


def recompute_node(tree: Tree, node: jax.Array, sp: SearchParamsArr,
                   active: jax.Array, bias_sum=None, bias_weight=None,
                   ending_bonus=None, dyn_center=0.0, sqrt_area=19.0):
    """Search::recomputeNodeStats: node stats = value-downweighted average of
    child stats + the node's own uncertainty-weighted NN evaluation.

    Children whose utility looks worse than the node's simple value average
    are downweighted by NormalCDF(z)^valueWeightExponent
    (downweightBadChildrenAndNormalizeWeight, searchupdatehelpers.cpp).

    When bias tables are passed and subtreeValueBiasFactor != 0, the node
    also (a) publishes its (children-avg minus own-NN) utility delta into
    its pattern slot, replacing its previous contribution, and (b) biases
    its own-NN utility toward the slot's average
    (searchupdatehelpers.cpp:26-36, 273-300). Returns (tree, bias_sum,
    bias_weight) when tables are passed, else tree.
    """
    children = tree.children[node]                      # [A]
    exists = children >= 0
    c = jnp.maximum(children, 0)
    # ONE stacked gather of every child stat (Tree.stats docstring); a
    # one-hot matmul formulation was measured identical on TPU v5e
    cstats = tree.stats[c]                              # [A, NUM_STATS]
    nstats = tree.stats[node]                           # [NUM_STATS]
    new_row, ba, bias_sum, bias_weight = _recompute_core(
        children, cstats, nstats, tree.policy[node],
        tree.pos.to_move[node], tree.bias_key[node], node == 0, sp,
        active, bias_sum, bias_weight, ending_bonus, dyn_center, sqrt_area)
    stats = tree.stats.at[node].set(jnp.where(active, new_row, nstats))
    best_action = tree.best_action.at[node].set(
        jnp.where(active, ba, tree.best_action[node]))
    tree = tree._replace(stats=stats, best_action=best_action)
    if bias_sum is not None:
        return tree, bias_sum, bias_weight
    return tree


def _recompute_core(children, cstats, nstats, pol, pla, bias_key, is_root,
                    sp: SearchParamsArr, active, bias_sum, bias_weight,
                    ending_bonus, dyn_center, sqrt_area):
    """Pool-free core of recompute_node: child rows in, new node row +
    refreshed best_action out (plus bias-table updates). backprop_path
    runs this inside its loop without touching the stats pool per
    iteration — per-iteration pool scatters made XLA relayout the whole
    [N, NUM_STATS] pool twice per playout level (trace: ~0.1ms/level of
    pure data formatting)."""
    exists = children >= 0
    w = jnp.where(exists, cstats[:, C_WEIGHT_SUM], 0.0)
    good = exists & (w > 0)
    winv = 1.0 / jnp.maximum(w, 1e-10)
    u_avg = cstats[:, C_UTILITY_SUM] * winv
    self_u = jnp.where(pla == B.WHITE, u_avg, -u_avg)
    total_w = jnp.sum(jnp.where(good, w, 0.0))

    # value-weighted downweighting
    stdevs = jnp.sqrt(1e-8 + 1.0 / (1.5 * jnp.sqrt(jnp.maximum(w, 1e-10))))
    simple_value = jnp.sum(jnp.where(good, self_u * w, 0.0)) / \
        jnp.maximum(total_w, 1e-10)
    z = (self_u - simple_value) / stdevs
    pfac = _norm_cdf(z) + 1e-4
    w_adj = jnp.where(good, w * jnp.power(pfac, sp.value_weight_exponent), 0.0)
    renorm = total_w / jnp.maximum(jnp.sum(w_adj), 1e-10)
    w_adj = jnp.where(sp.value_weight_exponent > 0, w_adj * renorm,
                      jnp.where(good, w, 0.0))

    def wsum(col):
        avg = cstats[:, col] * winv
        return jnp.sum(jnp.where(good, w_adj * avg, 0.0))

    scaling = jnp.where(good, w_adj * winv, 0.0)
    child_wsq = jnp.sum(scaling * scaling * cstats[:, C_WEIGHT_SQ_SUM])

    sw = nstats[C_NN_WEIGHT]                             # self weight
    nn_util = nstats[C_NN_UTILITY]
    new_last_delta = nstats[C_LAST_BIAS_DELTA]
    new_last_weight = nstats[C_LAST_BIAS_WEIGHT]
    if bias_sum is not None:
        use_bias = (sp.subtree_value_bias_factor != 0.0) & \
            (bias_key >= 0) & active
        key = jnp.maximum(bias_key, 0)
        # publish this node's delta (children-utility minus own-NN utility),
        # replacing its previous contribution
        children_util = wsum(C_UTILITY_SUM) / jnp.maximum(total_w, 1e-10)
        bias_w_new = jnp.power(jnp.maximum(total_w, 0.0),
                               sp.subtree_value_bias_weight_exponent)
        has_children = total_w > 1e-10
        delta_new = jnp.where(has_children,
                              (children_util - nn_util) * bias_w_new, 0.0)
        bias_w_new = jnp.where(has_children, bias_w_new, 0.0)
        d_delta = jnp.where(use_bias,
                            delta_new - nstats[C_LAST_BIAS_DELTA], 0.0)
        d_w = jnp.where(use_bias,
                        bias_w_new - nstats[C_LAST_BIAS_WEIGHT], 0.0)
        bias_sum = bias_sum.at[key].add(d_delta)
        bias_weight = bias_weight.at[key].add(d_w)
        new_last_delta = jnp.where(use_bias, delta_new, new_last_delta)
        new_last_weight = jnp.where(use_bias, bias_w_new, new_last_weight)
        # bias the node's own evaluation toward the table average
        entry_w = bias_weight[key]
        entry_avg = jnp.where(entry_w > 0.001,
                              bias_sum[key] / jnp.maximum(entry_w, 1e-10),
                              0.0)
        nn_util = jnp.where(use_bias,
                            nn_util + sp.subtree_value_bias_factor *
                            entry_avg, nn_util)
    # avoid-repeated-shapes: the node's pattern bonus raises/lowers its
    # recomputed white-utility average (search.cpp:1073)
    pat = nstats[C_PATTERN_BONUS]
    # ONE stacked row write: recomputed sums + carried-through own-eval
    # columns (column order = C_*)
    new_row = jnp.stack([
        total_w + sw,                                     # C_WEIGHT_SUM
        wsum(C_UTILITY_SUM) + sw * nn_util
            + pat * (total_w + sw),                       # C_UTILITY_SUM
        wsum(C_UTILITY_SQ_SUM) + sw * nn_util * nn_util,  # C_UTILITY_SQ_SUM
        wsum(C_WINLOSS_SUM) + sw * nstats[C_NN_WINLOSS],  # C_WINLOSS_SUM
        wsum(C_SCORE_MEAN_SUM) + sw * nstats[C_NN_SCORE_MEAN],
        wsum(C_SCORE_MEANSQ_SUM) + sw * nstats[C_NN_SCORE_MEANSQ],
        wsum(C_LEAD_SUM) + sw * nstats[C_NN_LEAD],        # C_LEAD_SUM
        child_wsq + sw * sw,                              # C_WEIGHT_SQ_SUM
        nstats[C_NN_UTILITY],
        nstats[C_NN_WINLOSS],
        nstats[C_NN_SCORE_MEAN],
        nstats[C_NN_SCORE_MEANSQ],
        nstats[C_NN_SCORE_STDEV],
        nstats[C_NN_LEAD],
        nstats[C_NN_WEIGHT],
        new_last_delta,                                   # C_LAST_BIAS_DELTA
        new_last_weight,                                  # C_LAST_BIAS_WEIGHT
        nstats[C_PATTERN_BONUS],
    ])
    # refresh the fast-descent cache from the NEW stats, reusing the
    # already-gathered child stats (Tree.best_action / select_path)
    if ending_bonus is None:
        ending_bonus = jnp.zeros_like(pol, dtype=jnp.float32)
    cw_sel = w
    cu_sel = jnp.where(exists, u_avg, 0.0)
    explore, value = _puct_terms(
        jnp.where(active, new_row, nstats), pol, exists, cw_sel, cu_sel,
        pla, is_root, ending_bonus, dyn_center, sqrt_area, sp)
    score = jnp.where(pol >= 0, explore + value, ILLEGAL)
    ba = jnp.argmax(score).astype(jnp.int32)
    return new_row, ba, bias_sum, bias_weight


def backprop_path(ss: SearchState, sel: PathSel, sp: SearchParamsArr,
                  do_update: jax.Array) -> SearchState:
    """Recompute stats for every path node, deepest first.

    The while_loop is bounded by the actual path length (not the static
    max_depth), so under vmap the trip count is the batch's deepest path.
    The stats pool stays OUT of the loop: each iteration gathers child
    rows from the pre-backup pool and patches the single child row that
    this backup has changed — which is exactly the previous iteration's
    output, because a path node's only on-path child is its path
    successor (edges increase depth by one, so no other path node can be
    its child, even under graph-search transposition links). New rows and
    best-actions accumulate in the carry and scatter into the pool once
    at the end; the per-iteration pool scatter otherwise made XLA
    relayout the whole [N, NUM_STATS] pool twice per level.
    """
    tree = ss.tree
    d = sel.path_nodes.shape[0]
    n = tree.visits.shape[0]
    # child aggregation touches only the 8 sum columns (C_WEIGHT_SUM ..
    # C_WEIGHT_SQ_SUM): gather from a loop-invariant 8-column slice so
    # each level moves 2.2x fewer bytes through the gather + its layout
    # copy (the own-eval columns are read only on the node itself)
    stats_sums = tree.stats[:, :C_WEIGHT_SQ_SUM + 1]   # [N, 8]

    def cond(carry):
        return carry[0] < sel.path_len

    def body(carry):
        # TWO levels per iteration, sharing ONE pool gather (and its
        # layout-conversion copy, which XLA re-emits per gather inside the
        # loop): the deeper level's cstats are patched from the previous
        # iteration's output, the shallower level's from the deeper
        # level's fresh row — the same exactness argument as the
        # one-level patch, applied twice.
        k, new_rows, bas, prev_node, prev_row, bsum, bw = carry

        def level_ctx(k_):
            i = sel.path_len - 1 - k_
            node_raw = sel.path_nodes[jnp.maximum(i, 0)]
            node = jnp.maximum(node_raw, 0)
            active = do_update & (node_raw >= 0) & (i >= 0)
            return i, node, active

        i1, node1, active1 = level_ctx(k)
        i2, node2, active2 = level_ctx(k + 1)
        ch1 = tree.children[node1]                     # [A]
        ch2 = tree.children[node2]                     # [A]
        both = stats_sums[jnp.maximum(
            jnp.concatenate([ch1, ch2]), 0)]           # [2A, 8]
        a_ = ch1.shape[0]
        cstats1, cstats2 = both[:a_], both[a_:]

        def level(node, children, cstats, i, active, pn, pr, bsum, bw):
            patch = (children == pn) & (pn >= 0)
            cstats = jnp.where(patch[:, None],
                               pr[None, :cstats.shape[1]], cstats)
            new_row, ba, bsum, bw = _recompute_core(
                children, cstats, tree.stats[node], tree.policy[node],
                tree.pos.to_move[node], tree.bias_key[node], node == 0, sp,
                active, bsum, bw, ss.ending_bonus, ss.dyn_score_center,
                ss.sqrt_board_area)
            return new_row, ba, bsum, bw

        nr1, ba1, bsum, bw = level(node1, ch1, cstats1, i1, active1,
                                   prev_node, prev_row, bsum, bw)
        nr2, ba2, bsum, bw = level(node2, ch2, cstats2, i2, active2,
                                   jnp.where(active1, node1, jnp.int32(-1)),
                                   nr1, bsum, bw)

        for i_, nr_, ba_, act_ in ((i1, nr1, ba1, active1),
                                   (i2, nr2, ba2, active2)):
            ic = jnp.maximum(i_, 0)
            new_rows = new_rows.at[ic].set(
                jnp.where(act_, nr_, new_rows[ic]))
            bas = bas.at[ic].set(jnp.where(act_, ba_, bas[ic]))
        prev_node = jnp.where(active2, node2,
                              jnp.where(active1, node1, jnp.int32(-1)))
        prev_row = jnp.where(active2, nr2,
                             jnp.where(active1, nr1, prev_row))
        return k + 2, new_rows, bas, prev_node, prev_row, bsum, bw

    init = (jnp.int32(0), jnp.zeros((d, NUM_STATS), jnp.float32),
            jnp.zeros((d,), jnp.int32), jnp.int32(-1),
            jnp.zeros((NUM_STATS,), jnp.float32), ss.bias_sum,
            ss.bias_weight)
    _, new_rows, bas, _, _, bsum, bw = jax.lax.while_loop(cond, body, init)
    # one scatter for the whole path (distinct nodes; invalid -> pad row)
    written = (sel.path_nodes >= 0) & \
        (jnp.arange(d) < sel.path_len) & do_update
    target = jnp.where(written, sel.path_nodes, n)
    stats = jnp.concatenate(
        [tree.stats, jnp.zeros((1, NUM_STATS), jnp.float32)])
    stats = stats.at[target].set(new_rows)[:n]
    best_action = jnp.concatenate(
        [tree.best_action, jnp.zeros((1,), jnp.int32)])
    best_action = best_action.at[target].set(bas)[:n]
    tree = tree._replace(stats=stats, best_action=best_action)
    return ss._replace(tree=tree, bias_sum=bsum, bias_weight=bw)


def extract_subtree(tree: Tree, action: jax.Array) -> Tree:
    """Re-root a single game's tree at the child reached by `action`
    (Search::makeMove tree reuse, search.h:253-257).

    Returns a compacted tree whose node 0 is the old root's child for
    `action` and whose nodes are exactly that child's subtree (stats,
    positions, and links preserved; everything else cleared). If the child
    was never expanded the result has num_nodes == 0 and the caller falls
    back to a fresh root.

    Membership is computed by pointer-jumping over the parent array
    (log-depth, fixed trip count); children are always allocated after
    parents, so the new root is the minimum index of its subtree and the
    cumsum compaction maps it to slot 0.
    """
    n = tree.visits.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    a = jnp.maximum(action, 0)
    new_root = tree.children[0, a]
    has = (new_root >= 0) & (action >= 0)
    nr = jnp.maximum(new_root, 0)

    valid = idx < tree.num_nodes
    in_sub = (idx == nr) & valid
    p = jnp.where(valid & (tree.parent >= 0), tree.parent, idx)
    steps = int(np.ceil(np.log2(max(n, 2)))) + 1
    for _ in range(steps):
        in_sub = in_sub | in_sub[p]
        p = p[p]
    in_sub = in_sub & valid & has

    new_idx = jnp.cumsum(in_sub.astype(jnp.int32)) - 1       # [-1..count)
    count = jnp.sum(in_sub.astype(jnp.int32))
    target = jnp.where(in_sub, new_idx, n)                   # n = dump slot

    def scatter(arr, fill=0):
        shape = (n + 1,) + arr.shape[1:]
        out = jnp.full(shape, fill, arr.dtype)
        out = out.at[target].set(arr)
        return out[:n]

    # remap index-valued arrays
    new_idx_pad = jnp.concatenate([new_idx, jnp.full((1,), -1, jnp.int32)])
    child_ok = (tree.children >= 0) & in_sub[jnp.clip(tree.children, 0,
                                                      n - 1)]
    children_rm = jnp.where(child_ok,
                            new_idx_pad[jnp.clip(tree.children, 0, n - 1)],
                            -1).astype(tree.children.dtype)
    parent_ok = (tree.parent >= 0) & in_sub[jnp.clip(tree.parent, 0, n - 1)]
    parent_rm = jnp.where(parent_ok,
                          new_idx_pad[jnp.clip(tree.parent, 0, n - 1)], -1)

    new_pos = jax.tree.map(scatter, tree.pos)
    # last-bias-contribution columns reset: the bias table is fresh per
    # search; pattern keys and every other stat survive re-rooting
    stats_kept = tree.stats.at[:, C_LAST_BIAS_DELTA].set(0.0)
    stats_kept = stats_kept.at[:, C_LAST_BIAS_WEIGHT].set(0.0)
    return Tree(
        pos=new_pos,
        ko_hash=scatter(tree.ko_hash),
        graph_hash=scatter(tree.graph_hash),
        parent=scatter(parent_rm, -1),
        parent_action=scatter(tree.parent_action, -1),
        depth=scatter(tree.depth - tree.depth[nr]),
        children=scatter(children_rm, -1),
        policy=scatter(tree.policy),
        visits=scatter(tree.visits),
        stats=scatter(stats_kept),
        bias_key=scatter(tree.bias_key, -1),
        laddered=scatter(tree.laddered),
        term_own=scatter(tree.term_own),
        best_action=scatter(tree.best_action),
        num_nodes=count,
    )


def make_nn_evaluator(model_apply: Callable, model_params: Any, size: int,
                      with_ladders: bool = True, sgf_meta=None,
                      feature_version: int = 7,
                      ladder_mode: str = "chase"):
    """Returns batched_eval(leaf_gs_batch, feat_params, rng) -> per-game NN
    outputs dict; the only cross-game-batched piece of the search.

    with_ladders: static toggle for featurizer planes 14-17 — the ladder
    solver is the single most expensive feature (~4x total featurizer
    cost), so throughput-critical searches may disable it (the reference
    always pays it, nninputs.cpp:2548).

    ladder_mode: in-search leaf evaluation defaults to the greedy chase
    solver — exact board mechanics, greedy search policy (ladder.py) —
    because the backtracking solver costs ~2 orders of magnitude more
    than the forward pass at search lane widths on TPU; per-move and
    data-writing featurization stays "exact".

    feature_version: input-feature version 3..7 matching the model
    (ModelDesc.input_version for reference nets; modelversion.cpp)."""

    def batched_eval(leaf_gs, feat_params, sym=None, prev_lad=None):
        """sym: optional int32[G] dihedral symmetry per game (nnRandomize,
        nneval.h:169-179): the input planes are transformed before the
        forward pass and policy/ownership transformed back, so callers see
        canonical-orientation outputs either way. Features are equivariant,
        so permuting the featurized planes equals featurizing the permuted
        board.

        prev_lad: optional (prev_laddered, prev_prev_laddered) bool[G, NN]
        cached ladder masks of the boards 1/2 moves ago (the search's
        per-node cache); with them only the current board is solved.

        Returns (raw, legal, laddered) — laddered bool[G, NN] is the
        current board's plane-14 mask in canonical orientation, for the
        caller to cache."""
        legal = jax.vmap(H.legal_moves, in_axes=(0, None))(leaf_gs, size)
        if prev_lad is not None and with_ladders:
            cur_lad = None
            if ladder_mode == "chase" and feature_version != 5 \
                    and jax.default_backend() == "tpu":
                # ONE Pallas kernel solves every game's board (on-core
                # chase loops, per-block early exit) instead of a
                # per-game vmapped while_loop — the dominant non-NN
                # search cost (ops/chase_pallas.py). TPU only: off-TPU
                # the per-game in-fill solve below traces the exact
                # pre-kernel program (CPU LLVM JIT section memory is
                # tight on the biggest search programs)
                from katago_tpu.game import ladder as LADM
                cur_lad = LADM.ladder_map_chase_batch(
                    leaf_gs.pos.board.stones.astype(jnp.int32), size,
                    ko_loc=leaf_gs.pos.simple_ko_loc)
            if cur_lad is not None:
                sp_feat, gl_feat = jax.vmap(
                    lambda g_, l_, p_, pp_, cl_: F.fill_features(
                        g_, size, feat_params, l_,
                        version=feature_version,
                        with_ladders=with_ladders,
                        ladder_mode=ladder_mode,
                        prev_laddered=p_, prev_prev_laddered=pp_,
                        cur_ladder=cl_)
                )(leaf_gs, legal, prev_lad[0], prev_lad[1], cur_lad)
            else:
                sp_feat, gl_feat = jax.vmap(
                    lambda g_, l_, p_, pp_: F.fill_features(
                        g_, size, feat_params, l_,
                        version=feature_version,
                        with_ladders=with_ladders,
                        ladder_mode=ladder_mode,
                        prev_laddered=p_, prev_prev_laddered=pp_)
                )(leaf_gs, legal, prev_lad[0], prev_lad[1])
        else:
            sp_feat, gl_feat = jax.vmap(
                lambda g_, l_: F.fill_features(g_, size, feat_params, l_,
                                               version=feature_version,
                                               with_ladders=with_ladders,
                                               ladder_mode=ladder_mode)
            )(leaf_gs, legal)
        g = sp_feat.shape[0]
        if with_ladders and feature_version != 5:
            laddered = sp_feat[:, :, 14] > 0.5
        else:
            laddered = jnp.zeros(
                (g, leaf_gs.pos.board.stones.shape[1]), bool)
        if sym is not None:
            sp_feat = jax.vmap(
                lambda f_, s_: SYM.transform_spatial(f_, s_, size)
            )(sp_feat, sym)
        sp_feat = sp_feat.reshape(
            g, size, size, F.NUM_SPATIAL_BY_VERSION[feature_version])
        if sgf_meta is not None:
            # humanSL profile conditioning: the 192-float metadata row
            # depends on the mover (fillMetadataRow nextPlayerIsWhite),
            # so both rows are baked as constants and selected per game
            from katago_tpu.models.sgfmetadata import fill_metadata_row
            row_b = jnp.asarray(fill_metadata_row(
                sgf_meta, next_player_is_white=False,
                board_area=size * size))
            row_w = jnp.asarray(fill_metadata_row(
                sgf_meta, next_player_is_white=True,
                board_area=size * size))
            rows = jnp.where((leaf_gs.pos.to_move == B.WHITE)[:, None],
                             row_w[None, :], row_b[None, :])
            raw = model_apply(model_params, sp_feat, gl_feat,
                              metadata=rows)
        else:
            raw = model_apply(model_params, sp_feat, gl_feat)
        if "supports_shortterm_error" in raw:
            # static no-error-head flag (pre-v9 desc nets): broadcast to a
            # per-game array so downstream jax.vmap over raw stays valid
            raw = dict(raw)
            raw["supports_shortterm_error"] = jnp.broadcast_to(
                jnp.asarray(raw["supports_shortterm_error"]), (g,))
        if sym is not None:
            raw = dict(raw)
            raw["policy_logits"] = jax.vmap(
                lambda p_, s_: SYM.untransform_policy(p_, s_, size)
            )(raw["policy_logits"], sym)
            own = raw.get("ownership_pretanh")
            if own is not None:
                nn = size * size
                own_flat = own.reshape(g, nn, -1)
                own_flat = jax.vmap(
                    lambda o_, s_: SYM.untransform_spatial(o_, s_, size)
                )(own_flat, sym)
                raw["ownership_pretanh"] = own_flat.reshape(own.shape)
        return raw, legal, laddered

    return batched_eval


def nn_leaf_eval(raw: dict, legal: jax.Array, gs_to_move: jax.Array,
                 sp: SearchParamsArr, dyn_center, sqrt_area,
                 policy_temp: jax.Array,
                 optimism: jax.Array | None = None) -> LeafEval:
    """Convert one game's NN outputs (mover perspective) to a LeafEval
    (white perspective utilities, masked softmax prior).

    optimism: optimistic-policy blend factor (policyOptimism); blends
    policy channel 1 (v12+ optimistic head) into channel 0 at the logit
    level like the reference backends (trtbackend.cpp:2082)."""
    value_probs = jax.nn.softmax(raw["value_logits"], axis=-1)
    winloss_mover = value_probs[0] - value_probs[1]
    mv = raw["miscvalue"]
    score_mover = mv[0] * 20.0
    stdev = jax.nn.softplus(mv[1]) * 20.0
    lead_mover = mv[2] * 20.0
    mmv = raw["moremiscvalue"]
    # v14+ error semantics (nneval.cpp:1163-1168): the net's raw channel x
    # parameterizes the predicted squared error as softplus(x/2)^2 * mult,
    # and the search consumes the square root — the error stdev —
    # softplus(x/2) * sqrt(mult). desc.py normalizes older format
    # versions' channels to this convention.
    st_wl_err = jax.nn.softplus(mmv[0] * 0.5) * 0.5          # sqrt(0.25)
    st_score_err = jax.nn.softplus(mmv[1] * 0.5) * 5.4772256  # sqrt(30)

    winloss_w = _white_persp(winloss_mover, gs_to_move)
    score_w = _white_persp(score_mover, gs_to_move)
    lead_w = _white_persp(lead_mover, gs_to_move)
    meansq_w = score_w * score_w + stdev * stdev
    util = utility_of(winloss_w, score_w, meansq_w, sp, dyn_center, sqrt_area)
    weight = uncertainty_weight(st_wl_err, st_score_err, score_w, sp,
                                dyn_center, sqrt_area)
    # pre-v9 nets have no error heads: weight 1.0 like the reference's
    # supportsShorttermError() guard (searchupdatehelpers.cpp:117)
    weight = jnp.where(
        jnp.asarray(raw.get("supports_shortterm_error", True)), weight, 1.0)

    pl = raw["policy_logits"]
    logits = pl[0]                                   # [A] channel 0
    if optimism is not None and pl.shape[0] > 1:
        logits = logits + (pl[1] - logits) * optimism
    logits = logits / jnp.maximum(sp.nn_policy_temperature, 1e-6)
    logits = logits / jnp.maximum(policy_temp, 1e-6)
    logits = jnp.where(legal, logits, -1e30)
    pol = jax.nn.softmax(logits)
    pol = jnp.where(legal, pol, -1.0)
    nn_area = legal.shape[0] - 1
    own_pre = raw.get("ownership_pretanh")
    if own_pre is None:          # stub models without an ownership head
        own_w = jnp.zeros((nn_area,), jnp.float32)
    else:
        own_mover = jnp.tanh(own_pre.reshape(-1)[:nn_area])
        own_w = _white_persp(own_mover, gs_to_move)
    return LeafEval(utility=util, winloss=winloss_w, score_mean=score_w,
                    score_meansq=meansq_w, score_stdev=stdev, lead=lead_w,
                    policy=pol, weight=weight, ownership=own_w)


class SearchResult(NamedTuple):
    ss: SearchState              # final search state (tree reusable later)
    root_visits: jax.Array      # int32[G]
    child_visits: jax.Array      # int32[G, A] per-action edge visits
    root_policy_prior: jax.Array  # f32[G, A]
    root_winloss: jax.Array      # f32[G] (white persp, tree-averaged)
    root_score_mean: jax.Array  # f32[G]
    root_lead: jax.Array         # f32[G]
    root_utility: jax.Array      # f32[G]
    child_winloss: jax.Array     # f32[G, A] per-child avg winloss (white)
    child_score_mean: jax.Array  # f32[G, A] per-child avg score (white)
    root_ownership: jax.Array    # f32[G, NN] tree-averaged ownership (white)
    root_ownership_stdev: jax.Array  # f32[G, NN] stdev of leaf ownerships
                                 # across the search (ownershipStdev)
    moves_ownership: jax.Array   # f32[G, A, NN] per-root-move subtree
                                 # ownership ([G,1,1] dummies unless
                                 # track_moves_ownership)
    moves_ownership_stdev: jax.Array  # f32[G, A, NN]
    moves_own_weight: jax.Array  # f32[G, A] subtree eval weight per move
    root_score_stdev: jax.Array  # f32[G] subtree score stdev
                                 # (expectedScoreStdev, searchresults.cpp)


def init_search(model_apply: Callable, model_params: Any,
                roots: H.GameState, sp: SearchParamsArr,
                rng: jax.Array, *, size: int, max_nodes: int,
                with_ladders: bool = True,
                ladder_mode: str = "chase",
                prev_tree: Tree | None = None,
                prev_actions: jax.Array | None = None,
                root_allowed_mask: jax.Array | None = None,
                root_num_symmetries: int = 1,
                sgf_meta=None,
                mirror=None,
                feature_version: int = 7,
                track_moves_ownership: bool = False) -> SearchState:
    """Build the initial SearchState for a batch of games: root NN eval,
    Dirichlet noise, dynamic score center, optional tree reuse
    (Search::beginSearch + makeMove, search.cpp:650/search.h:253-257).

    prev_tree/prev_actions: tree reuse — the previous search's trees
    [G,...] and the actions that were then played; each game re-roots at
    the played child (falling back to a fresh root when the child was
    never expanded). With prev_actions=None the prev_tree is taken as
    already rooted at the current position (callers that re-root
    incrementally, like the GTP engine, use this). Root Dirichlet noise
    and root policy temperature are re-applied to the reused root's
    stored prior."""
    nn = size * size
    g = roots.hist_len.shape[0]
    evaluator = make_nn_evaluator(model_apply, model_params, size,
                                  with_ladders=with_ladders,
                                  sgf_meta=sgf_meta,
                                  feature_version=feature_version,
                                  ladder_mode=ladder_mode)

    feat_params = F.FeatureParams(
        draw_equiv_wins_for_white=sp.draw_equivalent_wins_for_white,
        playout_doubling_advantage=sp.playout_doubling_advantage,
        conservative_pass=sp.conservative_pass,
    )

    # ---- initialize per-game search state with the root node ----
    trees = jax.vmap(lambda _: empty_tree(size, max_nodes))(jnp.arange(g))
    root_ko_hash = jax.vmap(
        lambda gs: H._pos_ko_hash(gs.pos, gs.rules))(roots)

    ss = SearchState(
        tree=trees,
        rules=roots.rules,
        root_hist=roots.ko_hash_hist,
        root_hist_len=roots.hist_len,
        dyn_score_center=jnp.zeros((g,), jnp.float32),
        # per-game true board area (rect/shaped boards mark off-board
        # cells WALL; cpuct and score scaling track the real area)
        sqrt_board_area=jnp.sqrt(jnp.sum(
            (roots.pos.board.stones != B.WALL).astype(jnp.float32),
            axis=-1)),
        bias_sum=jnp.zeros((g, BIAS_TABLE_SIZE), jnp.float32),
        bias_weight=jnp.zeros((g, BIAS_TABLE_SIZE), jnp.float32),
        own_sum=jnp.zeros((g, nn), jnp.float32),
        own_sq_sum=jnp.zeros((g, nn), jnp.float32),
        own_weight=jnp.zeros((g,), jnp.float32),
        ending_bonus=jnp.zeros((g, nn + 1), jnp.float32),
        root_prev_laddered=jnp.zeros((g, nn), bool),
        mo_sum=jnp.zeros((g,) + ((nn + 1, nn) if track_moves_ownership
                                 else (1, 1)), jnp.float32),
        mo_sq_sum=jnp.zeros((g,) + ((nn + 1, nn) if track_moves_ownership
                                    else (1, 1)), jnp.float32),
        mo_weight=jnp.zeros((g, nn + 1 if track_moves_ownership else 1),
                            jnp.float32),
    )
    if with_ladders:
        # ladder mask of the board one move before the root: depth-1
        # leaves read it as their grandparent board's cached mask
        if ladder_mode == "chase" and jax.default_backend() == "tpu":
            from katago_tpu.game import ladder as LADM
            prev_lad = LADM.ladder_map_chase_batch(
                roots.pos.prev_stones.astype(jnp.int32), size,
                ko_loc=roots.pos.prev_ko_loc).laddered
        elif ladder_mode == "chase":
            prev_lad = jax.vmap(
                lambda s_, k_: ladder_map_chase_fn(s_, size, k_))(
                roots.pos.prev_stones.astype(jnp.int32),
                roots.pos.prev_ko_loc)
        else:
            prev_lad = jax.vmap(lambda s, k: ladder_map_fn(s, size, k))(
                roots.pos.prev_stones.astype(jnp.int32),
                roots.pos.prev_ko_loc)
        ss = ss._replace(root_prev_laddered=prev_lad)

    # root NN eval, averaged over root_num_symmetries sampled dihedral
    # symmetries (rootNumSymmetriesToSample, searchparams.h:76; sampling
    # with replacement, averaging the derived values and policy probs)
    root_policy_temp = jnp.broadcast_to(sp.root_policy_temperature, (g,))

    def eval_root(raw_i, legal_i, to_move, dyn_c, sqrt_a, ptemp):
        return nn_leaf_eval(raw_i, legal_i, to_move, sp, dyn_c, sqrt_a,
                            ptemp, optimism=sp.root_policy_optimism)

    def eval_with_sym(sym_or_none):
        raw, legal, lad = evaluator(roots, feat_params, sym=sym_or_none)
        return jax.vmap(eval_root)(
            raw, legal, roots.pos.to_move, ss.dyn_score_center,
            ss.sqrt_board_area, root_policy_temp), legal, lad

    root_legal = None
    if root_num_symmetries <= 1:
        root_ev, root_legal, root_lad = eval_with_sym(None)
    else:
        rng, sym_key = jax.random.split(rng)
        syms = jax.random.randint(sym_key, (root_num_symmetries, g), 0, 8)
        ev0, root_legal, root_lad = eval_with_sym(syms[0])
        evs = [ev0] + [eval_with_sym(syms[i])[0]
                       for i in range(1, root_num_symmetries)]
        root_ev = jax.tree.map(
            lambda *xs: sum(xs) / float(len(xs)), *evs)
        # policy: illegal slots are -1 in every image (legality is
        # symmetry-invariant), so the mean keeps them exactly -1

    # wideRootNoise: smooth the root policy toward uniform for wider
    # analysis (searchexplorehelpers.cpp:89-90)
    def widen(pol):
        legal_m = pol >= 0
        p = jnp.power(jnp.maximum(pol, 1e-30),
                      1.0 / (4.0 * sp.wide_root_noise + 1.0))
        p = jnp.where(legal_m, p, 0.0)
        p = p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
        return jnp.where(legal_m, p, -1.0)
    root_ev = root_ev._replace(policy=jnp.where(
        sp.wide_root_noise > 0.0, widen(root_ev.policy), root_ev.policy))

    # per-root-move ending score bonuses (rootEndingBonusPoints)
    ss = ss._replace(ending_bonus=jax.vmap(
        lambda gs_i, ow: root_ending_bonus(gs_i, ow, sp, size)
    )(roots, root_ev.ownership))

    # dynamic score center from the root NN (search.cpp:1148-1150)
    expected = root_ev.score_mean
    center = expected * (1.0 - sp.dynamic_score_center_zero_weight)
    cap = ss.sqrt_board_area * sp.dynamic_score_center_scale
    ss = ss._replace(dyn_score_center=jnp.clip(center, expected - cap,
                                               expected + cap))

    if mirror is not None:
        from katago_tpu.search import mirror as MIR
        adj_pol = jax.vmap(
            lambda p, pl, mp, st, mm, mpla, madv, rp: MIR.adjust_policy(
                p, pl, mp, jnp.int32(0), st, mm, mpla, madv, rp, size)
        )(root_ev.policy, roots.pos.recent_moves[:, 0],
          roots.pos.to_move, roots.pos.board.stones, mirror.mirroring,
          mirror.mirror_pla, mirror.advantage, roots.pos.to_move)
        root_ev = root_ev._replace(policy=adj_pol)

    # Dirichlet noise at root (searchparams.h:44-47)
    rng, sub = jax.random.split(rng)
    def add_noise(pol, key):
        legal_mask = pol >= 0
        n_legal = jnp.maximum(jnp.sum(legal_mask), 1)
        alpha = sp.root_dirichlet_noise_total_concentration / n_legal
        gamma = jax.random.gamma(key, jnp.where(legal_mask, alpha, 1e-6))
        noise = gamma / jnp.maximum(jnp.sum(jnp.where(legal_mask, gamma, 0.0)), 1e-10)
        mixed = (1.0 - sp.root_dirichlet_noise_weight) * pol \
            + sp.root_dirichlet_noise_weight * noise
        out = jnp.where(legal_mask, mixed, -1.0)
        return jnp.where(sp.root_noise_enabled, out, pol)

    root_pol = jax.vmap(add_noise)(root_ev.policy,
                                   jax.random.split(sub, g))
    if root_allowed_mask is not None:
        # avoidMoves/allowMoves (gtp.cpp avoid-moves, Analysis_Engine.md):
        # disallowed root moves get an illegal prior so the search never
        # tries them
        root_pol = jnp.where(root_allowed_mask, root_pol, -1.0)

    # rootPruneUselessMoves (isAllowedRootMove, searchhelpers.cpp:311-341):
    # after the opponent passed four times in a row, never play inside
    # either side's pass-alive area (stops pass-vs-fill stalling loops)
    def useless_root_moves(gs):
        rm = gs.pos.recent_moves
        opp_passed4 = jnp.all(rm[jnp.array([0, 2, 4, 6])] >= nn)
        stones_r = gs.pos.board.stones
        safe_pla, _ = benson.pass_alive_area_for(
            stones_r, gs.pos.to_move, gs.rules.multi_suicide, size,
            jnp.bool_(False), jnp.bool_(False))
        safe_opp, _ = benson.pass_alive_area_for(
            stones_r, B.opponent(gs.pos.to_move), gs.rules.multi_suicide,
            size, jnp.bool_(False), jnp.bool_(False))
        banned = (safe_pla | safe_opp) & opp_passed4 \
            & sp.root_prune_useless_moves
        return jnp.concatenate([banned, jnp.zeros((1,), bool)])

    banned = jax.vmap(useless_root_moves)(roots)

    # rootSymmetryPruning (markDuplicateMoveLocs, nninputs.cpp:675-760):
    # on positions invariant under dihedral symmetries (and free of any
    # ko/superko bans), keep one representative move per symmetry orbit
    # — the corner-convention representative — and prune the duplicates
    def sym_dup_moves(gs, legal_g):
        perm = jnp.asarray(SYM.loc_perm(size))[:, :nn]        # [8, NN]
        stones_r = gs.pos.board.stones
        inv = jnp.all(stones_r[None, :] == stones_r[perm], axis=1)  # [8]
        in_encore = gs.pos.encore_phase > 0
        krb = gs.pos.ko_recap_blocked
        inv = inv & (~in_encore | jnp.all(
            krb[None, :] == krb[perm], axis=1))
        ses = gs.pos.second_encore_start
        inv = inv & ((gs.pos.encore_phase < 2) | jnp.all(
            ses[None, :] == ses[perm], axis=1))
        inv = inv.at[0].set(True)
        # no symmetry treatment while any move is ko/superko banned
        board_no_ko = gs.pos.board._replace(ko_loc=jnp.int32(-1))
        basic = B.legal_moves_basic(board_no_ko, gs.pos.to_move,
                                    gs.rules.multi_suicide, size)
        ko_banned_any = jnp.any(basic & ~legal_g[:nn]) \
            | (gs.pos.board.ko_loc >= 0)
        active = inv & ~ko_banned_any
        active = active.at[0].set(True)
        # corner-convention representative: black prefers high-x/low-y,
        # white the mirror (nninputs.cpp:727-731)
        xs = jnp.arange(nn) % size
        ys = jnp.arange(nn) // size
        rank = jnp.where(gs.pos.to_move == B.BLACK,
                         (size - 1 - xs) * size + ys,
                         xs * size + (size - 1 - ys))
        sym_rank = jnp.where(active[:, None], rank[perm], jnp.int32(2**30))
        orbit_min = jnp.min(sym_rank, axis=0)
        dup = (rank > orbit_min) & sp.root_symmetry_pruning
        return jnp.concatenate([dup, jnp.zeros((1,), bool)])

    if root_legal is not None:
        banned = banned | jax.vmap(sym_dup_moves)(roots, root_legal)

    # never ban every move: if the mask would empty the root, drop it
    any_left = jnp.any((root_pol >= 0) & ~banned, axis=1, keepdims=True)
    root_pol = jnp.where(banned & any_left, -1.0, root_pol)
    root_ev = root_ev._replace(policy=root_pol)

    # a finished root keeps exact terminal values in its cached eval
    # columns + term_own (terminal_eval reads them on revisits)
    root_term = jax.vmap(
        lambda p, r, dc, sa: terminal_eval_of_pos(p, r, sp, size, dc, sa,
                                                  nn + 1)
    )(roots.pos, roots.rules, ss.dyn_score_center, ss.sqrt_board_area)

    def _merge_root(t, n_):
        sh = (-1,) + (1,) * (n_.ndim - 1)
        return jnp.where(roots.pos.game_over.reshape(sh), t, n_)

    root_ev = jax.tree.map(_merge_root,
                           root_term._replace(policy=root_ev.policy),
                           root_ev)
    root_town = jnp.where(roots.pos.game_over[:, None],
                          jnp.round(root_term.ownership),
                          0.0).astype(jnp.int8)

    # install root node (index 0) per game
    def install_root(ss_tree, gs, kh, ev, lad0, town0):
        tree = ss_tree
        pos = jax.tree.map(lambda store, v: store.at[0].set(v), tree.pos, gs.pos)
        tree = tree._replace(
            pos=pos,
            ko_hash=tree.ko_hash.at[0].set(kh),
            graph_hash=tree.graph_hash.at[0].set(GH.state_hash(
                kh, gs.pos.game_over, gs.pos.consec_passes)),
            policy=tree.policy.at[0].set(ev.policy.astype(POL_DT)),
            visits=tree.visits.at[0].set(1),
            stats=tree.stats.at[0].set(
                leaf_stats_row(ev, jnp.float32(0.0))),
            laddered=tree.laddered.at[0].set(lad0),
            term_own=tree.term_own.at[0].set(town0),
            num_nodes=jnp.int32(1),
        )
        return tree

    fresh = jax.vmap(install_root)(ss.tree, roots, root_ko_hash, root_ev,
                                   root_lad, root_town)

    if prev_tree is not None:
        prev_n = prev_tree.visits.shape[1]
        if prev_n > max_nodes:
            raise ValueError(
                f"tree reuse requires prev max_nodes ({prev_n}) <= new "
                f"max_nodes ({max_nodes}); shrinking pools would corrupt "
                "subtree links")
        if prev_actions is not None:
            reused = jax.vmap(extract_subtree)(prev_tree, prev_actions)
        else:
            reused = prev_tree
        if prev_n < max_nodes:
            # pad the reused pool with empty rows up to the new budget
            empty = jax.vmap(lambda _: empty_tree(size, max_nodes))(
                jnp.arange(g))
            reused = jax.tree.map(
                lambda a, e: (jnp.concatenate(
                    [a, e[:, prev_n:]], axis=1) if a.ndim >= 2 and
                    a.shape[1] == prev_n else a),
                reused, empty)
        ok = reused.num_nodes > 0
        # re-apply the root policy transform (temperature + noise) to the
        # reused root's stored leaf prior
        rng, sub2 = jax.random.split(rng)

        def reroot_policy(pol, key, temp):
            legal_mask = pol >= 0
            pl_ = jnp.where(legal_mask, jnp.maximum(pol, 1e-10), 1.0)
            pl_ = jnp.power(pl_, 1.0 / jnp.maximum(temp, 1e-6))
            pl_ = pl_ / jnp.maximum(
                jnp.sum(jnp.where(legal_mask, pl_, 0.0)), 1e-10)
            return jnp.where(legal_mask,
                             add_noise(jnp.where(legal_mask, pl_, -1.0), key),
                             -1.0)

        reroot_pol = jax.vmap(reroot_policy)(
            reused.policy[:, 0, :], jax.random.split(sub2, g),
            root_policy_temp)
        if root_allowed_mask is not None:
            reroot_pol = jnp.where(root_allowed_mask, reroot_pol, -1.0)
        reused = reused._replace(
            policy=reused.policy.at[:, 0, :].set(reroot_pol.astype(POL_DT)),
            laddered=reused.laddered.at[:, 0].set(root_lad),
            term_own=reused.term_own.at[:, 0].set(root_town),
            # no pattern bonus on the root itself (search.cpp:726)
            stats=reused.stats.at[:, 0, C_PATTERN_BONUS].set(0.0),
            # the live game state is authoritative for the root position
            pos=jax.tree.map(lambda store, v: store.at[:, 0].set(v),
                             reused.pos, roots.pos))
        tree0 = jax.tree.map(
            lambda r, f: jnp.where(
                ok.reshape((-1,) + (1,) * (f.ndim - 1)), r, f)
            if f.ndim > 1 else jnp.where(ok, r, f),
            reused, fresh)
        ss = ss._replace(tree=tree0)
    else:
        ss = ss._replace(tree=fresh)

    # the tree-averaged-ownership accumulator starts from the root eval
    ss = ss._replace(
        own_sum=root_ev.weight[:, None] * root_ev.ownership,
        own_sq_sum=root_ev.weight[:, None] * root_ev.ownership ** 2,
        own_weight=root_ev.weight)
    # seed the fast-descent cache at the root (fresh roots are childless;
    # reused roots evaluate over their carried children)
    ba0 = jax.vmap(
        lambda t, eb, dc, sa: node_best_action(t, jnp.int32(0), sp, eb,
                                               dc, sa)
    )(ss.tree, ss.ending_bonus, ss.dyn_score_center, ss.sqrt_board_area)
    ss = ss._replace(tree=ss.tree._replace(
        best_action=ss.tree.best_action.at[:, 0].set(ba0)))
    return ss


def run_playouts(model_apply: Callable, model_params: Any,
                 ss: SearchState, sp: SearchParamsArr, rng: jax.Array, *,
                 size: int, num_sims: int, max_depth: int = 64,
                 with_ladders: bool = True,
                 ladder_mode: str = "chase",
                 max_visits: int | None = None,
                 active_mask: jax.Array | None = None,
                 max_superko_retries: int = 3,
                 sgf_meta=None,
                 mirror=None,
                 pattern_bonus=None,
                 feature_version: int = 7,
                 track_moves_ownership: bool = False) -> SearchState:
    """Advance the search by num_sims playouts (the chunked analogue of the
    reference's runWholeSearch playout threads, search.cpp:473-607).

    Chunking is the TPU-native mechanism for time-managed and streaming
    search: the host calls this repeatedly with small num_sims, checking
    clocks and emitting analysis between calls (search/driver.py).

    max_visits: per-game visit cap — games whose root already has that
    many visits run masked no-op playouts (the reference's maxVisits
    termination, searchparams.h:131). active_mask [G]: caller-side game
    masking (finished games in selfplay).

    A superko-rejected expansion marks the prior illegal and retries the
    descent within the same playout up to max_superko_retries times
    (playoutDescend's loop, search.cpp:1189); only a game that exhausts
    the retries voids its playout."""
    nn = size * size
    a = nn + 1
    g = ss.root_hist_len.shape[0]
    evaluator = make_nn_evaluator(model_apply, model_params, size,
                                  with_ladders=with_ladders,
                                  sgf_meta=sgf_meta,
                                  feature_version=feature_version,
                                  ladder_mode=ladder_mode)
    feat_params = F.FeatureParams(
        draw_equiv_wins_for_white=sp.draw_equivalent_wins_for_white,
        playout_doubling_advantage=sp.playout_doubling_advantage,
        conservative_pass=sp.conservative_pass,
    )

    def superko_check(gs_i, kh):
        # leaf_gs history already includes the leaf hash at slot
        # hist_len-1; check for an identical hash earlier in the history
        max_hist = gs_i.ko_hash_hist.shape[0]
        idx = jnp.arange(max_hist)
        valid = idx < (gs_i.hist_len - 1)
        eq = jnp.all(gs_i.ko_hash_hist == kh[None, :], axis=-1)
        return jnp.any(eq & valid)

    def select_leaf(ss):
        sel = jax.vmap(select_path, in_axes=(0, None, None, 0))(
            ss, sp, max_depth, mirror)
        leaf_pos, leaf_kh, leaf_gs = jax.vmap(
            make_leaf_gamestate, in_axes=(0, 0, None, None))(ss, sel, size,
                                                             max_depth)
        sk = jax.vmap(superko_check)(leaf_gs, leaf_kh) & ~sel.is_terminal
        # pass never violates superko-based bans in our engine semantics
        sk = sk & (sel.leaf_action < nn)
        return sel, leaf_pos, leaf_kh, leaf_gs, sk

    def one_sim(carry, _):
        ss, rng = carry
        active = jnp.ones((g,), bool) if active_mask is None else active_mask
        if max_visits is not None:
            active = active & (ss.tree.visits[:, 0] < max_visits)

        sel, leaf_pos, leaf_kh, leaf_gs, sk = select_leaf(ss)
        sk = sk & active

        # retry descent for superko-rejected expansions
        def mark_illegal(tree, need, sel_c):
            gidx = jnp.arange(g)
            pa = jnp.maximum(sel_c.leaf_action, 0)
            old = tree.policy[gidx, sel_c.leaf_parent, pa]
            tree = tree._replace(
                policy=tree.policy.at[gidx, sel_c.leaf_parent, pa].set(
                    jnp.where(need, -1.0, old)))
            # the retried descent follows cached best_action — refresh the
            # edited node so it steers away from the banned prior
            ba = jax.vmap(
                lambda t, nd, eb, dc, sa: node_best_action(t, nd, sp, eb,
                                                           dc, sa)
            )(tree, sel_c.leaf_parent, ss.ending_bonus,
              ss.dyn_score_center, ss.sqrt_board_area)
            return tree._replace(
                best_action=tree.best_action.at[gidx, sel_c.leaf_parent].set(
                    jnp.where(need, ba,
                              tree.best_action[gidx, sel_c.leaf_parent])))

        def retry_cond(c):
            need, tries = c[5], c[6]
            return jnp.any(need) & (tries < max_superko_retries)

        def retry_body(c):
            ss_c, sel_c, lp_c, lk_c, lg_c, need, tries = c
            ss2 = ss_c._replace(tree=mark_illegal(ss_c.tree, need, sel_c))
            sel_n, lp_n, lk_n, lg_n, sk_n = select_leaf(ss2)

            def merge(old, new):
                sh = (-1,) + (1,) * (new.ndim - 1)
                return jnp.where(need.reshape(sh), new, old)

            sel_m = jax.tree.map(merge, sel_c, sel_n)
            lp_m = jax.tree.map(merge, lp_c, lp_n)
            lk_m = merge(lk_c, lk_n)
            lg_m = jax.tree.map(merge, lg_c, lg_n)
            return ss2, sel_m, lp_m, lk_m, lg_m, need & sk_n, tries + 1

        ss, sel, leaf_pos, leaf_kh, leaf_gs, void, _ = jax.lax.while_loop(
            retry_cond, retry_body,
            (ss, sel, leaf_pos, leaf_kh, leaf_gs, sk, jnp.int32(0)))

        # per-eval random symmetry (nnRandomize, nneval.h:169-179)
        rng, sym_key = jax.random.split(rng)
        sym = jnp.where(sp.nn_random_symmetry,
                        jax.random.randint(sym_key, (g,), 0, 8), 0)
        # cached ladder masks of the parent / grandparent boards (= the
        # leaf's prev / prev-prev boards) so featurization solves only the
        # leaf board (see Tree.laddered)
        gi_ = jnp.arange(g)
        pmask = ss.tree.laddered[gi_, sel.leaf_parent]
        gp_ = ss.tree.parent[gi_, sel.leaf_parent]
        gpmask = jnp.where((gp_ >= 0)[:, None],
                           ss.tree.laddered[gi_, jnp.maximum(gp_, 0)],
                           ss.root_prev_laddered)
        raw, legal, leaf_lad = evaluator(leaf_gs, feat_params, sym=sym,
                                         prev_lad=(pmask, gpmask))
        ptemp = jnp.ones((g,), jnp.float32)
        nn_ev = jax.vmap(
            lambda r, l, tm, dc, sa, pt: nn_leaf_eval(
                r, l, tm, sp, dc, sa, pt, optimism=sp.policy_optimism)
        )(raw, legal, leaf_gs.pos.to_move, ss.dyn_score_center,
          ss.sqrt_board_area, ptemp)
        term_ev = jax.vmap(
            lambda s, node: terminal_eval(s, node, sp, size)
        )(ss, sel.terminal_node)
        # a freshly-expanded leaf that finishes the game gets exact terminal
        # values (with the NN's legal-masked policy irrelevant: no children
        # will ever be selected below a finished node). The exact scoring is
        # a full Benson + labels fixpoint chain, and with a trained net
        # almost no playout ends the game mid-tree — so it runs under a
        # batch-level cond and is skipped entirely when no game's leaf is
        # terminal this sim.
        def _score_leaves(args):
            lp, rl, dc, sa = args
            return jax.vmap(
                lambda p, r, d_, s_: terminal_eval_of_pos(p, r, sp, size,
                                                          d_, s_, a)
            )(lp, rl, dc, sa)

        def _skip_leaves(args):
            lp, _, dc, _ = args
            g_ = lp.game_over.shape[0]
            return LeafEval(
                utility=jnp.zeros((g_,), jnp.float32),
                winloss=jnp.zeros((g_,), jnp.float32),
                score_mean=jnp.zeros((g_,), jnp.float32),
                score_meansq=jnp.zeros((g_,), jnp.float32),
                score_stdev=jnp.zeros((g_,), jnp.float32),
                lead=jnp.zeros((g_,), jnp.float32),
                policy=jnp.full((g_, a), -1.0, jnp.float32),
                weight=jnp.ones((g_,), jnp.float32),
                ownership=jnp.zeros((g_, nn), jnp.float32))

        leaf_term_ev = jax.lax.cond(
            jnp.any(leaf_pos.game_over), _score_leaves, _skip_leaves,
            (leaf_pos, ss.rules, ss.dyn_score_center, ss.sqrt_board_area))

        def merge_ev(t, lt, n_):
            sh = (-1,) + (1,) * (n_.ndim - 1)
            out = jnp.where(leaf_pos.game_over.reshape(sh), lt, n_)
            return jnp.where(sel.is_terminal.reshape(sh), t, out)

        # keep the NN policy for the leaf even if terminal (harmless)
        ev = jax.tree.map(merge_ev, term_ev,
                          leaf_term_ev._replace(policy=nn_ev.policy), nn_ev)

        if mirror is not None:
            # anti-mirror prior boosts on the fresh node's policy
            # (maybeApplyAntiMirrorPolicy, searchmirror.cpp:95-153)
            from katago_tpu.search import mirror as MIR
            depth = ss.tree.depth[jnp.arange(g), sel.leaf_parent] + 1
            adj_pol = jax.vmap(
                lambda p, pl, mp, d, st, mm, mpla, madv, rp: (
                    MIR.adjust_policy(p, pl, mp, d, st, mm, mpla, madv,
                                      rp, size))
            )(ev.policy, sel.leaf_action, leaf_pos.to_move, depth,
              leaf_pos.board.stones, mirror.mirroring, mirror.mirror_pla,
              mirror.advantage, ss.tree.pos.to_move[:, 0])
            ev = ev._replace(policy=adj_pol)

        if pattern_bonus is not None:
            # avoid-repeated-shapes bonus of the expansion move, resolved
            # against the host-built table (patternbonustable.cpp get)
            from katago_tpu.search import patternbonus as PB
            gi = jnp.arange(g)
            pat_leaf = jax.vmap(
                lambda st, mv, pl: PB.lookup(pattern_bonus, st, mv, pl,
                                             size)
            )(ss.tree.pos.board.stones[gi, sel.leaf_parent],
              jnp.maximum(sel.leaf_action, 0),
              ss.tree.pos.to_move[gi, sel.leaf_parent])
        else:
            pat_leaf = None
        ss = jax.vmap(insert_and_backup,
                      in_axes=(0, 0, 0, 0, 0, 0, 0, None, 0, 0))(
            ss, sel, leaf_pos, leaf_kh, ev, void, active, sp, pat_leaf,
            leaf_lad)
        ok = active & ~void
        ss = ss._replace(
            own_sum=ss.own_sum + jnp.where(
                ok[:, None], ev.weight[:, None] * ev.ownership, 0.0),
            own_sq_sum=ss.own_sq_sum + jnp.where(
                ok[:, None], ev.weight[:, None] * ev.ownership ** 2, 0.0),
            own_weight=ss.own_weight + jnp.where(ok, ev.weight, 0.0))
        if track_moves_ownership:
            # attribute the leaf eval to the playout's root child
            # (analysis.cpp includeMovesOwnership: per-move subtree
            # ownership is the weighted average over that child's leaves)
            gi = jnp.arange(g)
            ra = jnp.maximum(sel.root_action, 0)
            okm = ok & (sel.root_action >= 0)
            wo = jnp.where(okm[:, None],
                           ev.weight[:, None] * ev.ownership, 0.0)
            ss = ss._replace(
                mo_sum=ss.mo_sum.at[gi, ra].add(wo),
                mo_sq_sum=ss.mo_sq_sum.at[gi, ra].add(
                    jnp.where(okm[:, None],
                              ev.weight[:, None] * ev.ownership ** 2, 0.0)),
                mo_weight=ss.mo_weight.at[gi, ra].add(
                    jnp.where(okm, ev.weight, 0.0)))
        return (ss, rng), None

    (ss, rng), _ = jax.lax.scan(one_sim, (ss, rng), None, length=num_sims)
    return ss


def collect_results(ss: SearchState) -> SearchResult:
    """Root/child statistics of the current tree (searchresults.cpp
    getRootValues / per-child analysis data)."""
    tree = ss.tree
    child_idx = jnp.maximum(tree.children[:, 0, :], 0)
    has_child = tree.children[:, 0, :] >= 0
    cvis = jnp.where(has_child,
                     jnp.take_along_axis(tree.visits, child_idx, axis=1), 0)
    root_w = jnp.maximum(tree.weight_sum[:, 0], 1e-10)
    cw = jnp.maximum(jnp.take_along_axis(tree.weight_sum, child_idx, axis=1),
                     1e-10)
    child_wl = jnp.where(
        has_child, jnp.take_along_axis(tree.winloss_sum, child_idx,
                                       axis=1) / cw, 0.0)
    child_sc = jnp.where(
        has_child, jnp.take_along_axis(tree.score_mean_sum, child_idx,
                                       axis=1) / cw, 0.0)
    return SearchResult(
        ss=ss,
        root_visits=tree.visits[:, 0],
        child_visits=cvis,
        root_policy_prior=tree.policy[:, 0, :].astype(jnp.float32),
        root_winloss=tree.winloss_sum[:, 0] / root_w,
        root_score_mean=tree.score_mean_sum[:, 0] / root_w,
        root_lead=tree.lead_sum[:, 0] / root_w,
        root_utility=tree.utility_sum[:, 0] / root_w,
        child_winloss=child_wl,
        child_score_mean=child_sc,
        root_ownership=ss.own_sum / jnp.maximum(ss.own_weight, 1e-10)[:, None],
        root_ownership_stdev=jnp.sqrt(jnp.maximum(
            ss.own_sq_sum / jnp.maximum(ss.own_weight, 1e-10)[:, None]
            - (ss.own_sum
               / jnp.maximum(ss.own_weight, 1e-10)[:, None]) ** 2, 0.0)),
        moves_ownership=ss.mo_sum
        / jnp.maximum(ss.mo_weight, 1e-10)[..., None],
        moves_ownership_stdev=jnp.sqrt(jnp.maximum(
            ss.mo_sq_sum / jnp.maximum(ss.mo_weight, 1e-10)[..., None]
            - (ss.mo_sum
               / jnp.maximum(ss.mo_weight, 1e-10)[..., None]) ** 2, 0.0)),
        moves_own_weight=ss.mo_weight,
        root_score_stdev=jnp.sqrt(jnp.maximum(
            tree.score_meansq_sum[:, 0] / root_w
            - (tree.score_mean_sum[:, 0] / root_w) ** 2, 0.0)),
    )


def extract_pv(tree: Tree, max_len: int = 15,
               start: jax.Array | int = 0) -> tuple[jax.Array, jax.Array]:
    """Principal variation by greedy max-edge-visits descent
    (Search::appendPV / getPV, searchresults.cpp:773-867). Single game;
    vmap for the batch. `start`: node to descend from (0 = root; pass a
    child index for per-candidate continuation PVs). Returns (moves
    int32[max_len], -1 padded, and pv_len int32)."""
    def body(carry, _):
        node, done = carry
        children = tree.children[node]
        c = jnp.maximum(children, 0)
        w = jnp.where(children >= 0, tree.visits[c], -1)
        best = jnp.argmax(w).astype(jnp.int32)
        child = tree.children[node, best]
        valid = (child >= 0) & (w[best] > 0) & ~done
        move = jnp.where(valid, best, -1)
        return (jnp.where(valid, jnp.maximum(child, 0), node),
                done | ~valid), move

    start = jnp.asarray(start, jnp.int32)
    (_, _), moves = jax.lax.scan(
        body, (start, start < 0), None, length=max_len)
    return moves, jnp.sum((moves >= 0).astype(jnp.int32))


def root_ending_bonus(gs: H.GameState, own_white: jax.Array,
                      sp: SearchParamsArr, size: int) -> jax.Array:
    """getEndingWhiteScoreBonus (searchhelpers.cpp:351-420): per-root-move
    white-perspective score bonuses, scaled by rootEndingBonusPoints.

    Area-ish scoring: discourage playing inside either side's settled
    territory (per the root NN ownership), except captures and except
    own-territory points adjacent to opponent stones or connecting
    non-pass-alive own groups; with a button, slightly discourage
    passing. Territory scoring: additionally discourage passing so dame
    get filled in the main phase. Single game; vmap over the batch."""
    nn = size * size
    stones = gs.pos.board.stones
    pla = gs.pos.to_move
    opp = B.opponent(pla)
    labels = B.connected_labels(stones, size)
    libs = B.chain_liberties(stones, labels, size)
    area_ish = (gs.rules.scoring_rule == R.SCORING_AREA) \
        | (gs.pos.encore_phase >= 2)
    own_pla = jnp.where(pla == B.WHITE, own_white, -own_white)
    extreme, tail = 0.95, 0.05

    nbr_s = B.shift4(stones, size, B.WALL)
    nbr_libs = B.shift4(libs, size, jnp.int32(0))
    nbr_lab = B.shift4(labels, size, jnp.int32(nn))
    would_capture = jnp.any((nbr_s == opp) & (nbr_libs == 1), axis=0)
    adj_opp = jnp.any(nbr_s == opp, axis=0)
    # own non-pass-alive group connection (Board::isNonPassAliveSelfConnection)
    safe_all, _ = benson.pass_alive_area_for(
        stones, pla, gs.rules.multi_suicide, size,
        jnp.bool_(False), jnp.bool_(False))
    nbr_safe = B.shift4(safe_all.astype(jnp.int32), size, jnp.int32(1)) > 0
    nonpa_own = (nbr_s == pla) & ~nbr_safe
    lab_or_big = jnp.where(nonpa_own, nbr_lab, nn)
    srt = jnp.sort(lab_or_big, axis=0)
    distinct = (srt[0] < nn).astype(jnp.int32) + jnp.sum(
        ((srt[1:] != srt[:-1]) & (srt[1:] < nn)).astype(jnp.int32), axis=0)
    self_conn = distinct >= 2

    opp_owned = jnp.clip((-extreme - own_pla) / tail, 0.0, 1.0)
    own_owned = jnp.clip((own_pla - extreme) / tail, 0.0, 1.0)
    own_owned = jnp.where(adj_opp | self_conn, 0.0, own_owned)
    pen = jnp.where(area_ish,
                    jnp.where(would_capture, 0.0, opp_owned) + own_owned,
                    opp_owned + own_owned)
    pen = jnp.where(gs.pos.board.ko_loc < 0, pen, 0.0)
    pass_pen = jnp.where(area_ish,
                         jnp.where(gs.rules.has_button, 0.5, 0.0),
                         jnp.float32(2.0 / 3.0))
    extra = jnp.concatenate([-pen, -pass_pen[None]]) \
        * sp.root_ending_bonus_points
    return jnp.where(pla == B.WHITE, extra, -extra)


def run_search(model_apply: Callable, model_params: Any,
               roots: H.GameState, sp: SearchParamsArr,
               rng: jax.Array, *, size: int, num_sims: int,
               max_nodes: int, max_depth: int = 64,
               with_ladders: bool = True,
               ladder_mode: str = "chase",
               prev_tree: Tree | None = None,
               prev_actions: jax.Array | None = None,
               root_allowed_mask: jax.Array | None = None,
               max_visits: int | None = None,
               active_mask: jax.Array | None = None,
               root_num_symmetries: int = 1,
               sgf_meta=None,
               mirror=None,
               pattern_bonus=None,
               feature_version: int = 7,
               track_moves_ownership: bool = False) -> SearchResult:
    """One-shot search: init + num_sims playouts + results. roots:
    GameState[G]. See init_search/run_playouts for the chunked API used by
    time-managed and streaming searches. mirror: optional anti-mirror
    verdict (search/mirror.py) — a static toggle, so mirror-free searches
    compile without any of its cost."""
    rng, r_init, r_play = jax.random.split(rng, 3)
    ss = init_search(model_apply, model_params, roots, sp, r_init,
                     size=size, max_nodes=max_nodes,
                     with_ladders=with_ladders, ladder_mode=ladder_mode,
                     prev_tree=prev_tree,
                     prev_actions=prev_actions,
                     root_allowed_mask=root_allowed_mask,
                     root_num_symmetries=root_num_symmetries,
                     sgf_meta=sgf_meta, mirror=mirror,
                     feature_version=feature_version,
                     track_moves_ownership=track_moves_ownership)
    ss = run_playouts(model_apply, model_params, ss, sp, r_play, size=size,
                      num_sims=num_sims, max_depth=max_depth,
                      with_ladders=with_ladders, ladder_mode=ladder_mode,
                      max_visits=max_visits,
                      active_mask=active_mask, sgf_meta=sgf_meta,
                      mirror=mirror, pattern_bonus=pattern_bonus,
                      feature_version=feature_version,
                      track_moves_ownership=track_moves_ownership)
    return collect_results(ss)


def _child_lcb_radius(result: SearchResult, sp: SearchParamsArr):
    """Per-root-child self-utility LCB + radius
    (Search::getSelfUtilityLCBAndRadius, searchhelpers.cpp:555-598).
    Returns (exists, good, w, self_u, radius, lcb) — all [G, A], lcb and
    self_u in the MOVER's perspective."""
    tree = result.ss.tree
    children = tree.children[:, 0, :]                    # [G, A]
    exists = children >= 0
    c = jnp.maximum(children, 0)

    def gat(arr):
        return jnp.take_along_axis(arr, c, axis=1)

    w = jnp.where(exists, gat(tree.weight_sum), 0.0)
    wsq = jnp.where(exists, gat(tree.weight_sq_sum), 0.0)
    winv = 1.0 / jnp.maximum(w, 1e-10)
    u_avg = gat(tree.utility_sum) * winv
    usq_avg = gat(tree.utility_sq_sum) * winv

    radius_max = 2.0 * (sp.win_loss_utility_factor
                        + sp.static_score_utility_factor
                        + sp.dynamic_score_utility_factor) * sp.lcb_stdevs
    ess = w * w / jnp.maximum(wsq, 1e-10)
    prior_w = w / jnp.maximum(ess * ess * ess, 1e-10)
    r2 = (radius_max / (2.0 * sp.lcb_stdevs)) ** 2
    usq_avg = jnp.maximum(usq_avg, u_avg * u_avg + 1e-8)
    usq_avg = (usq_avg * w + (usq_avg + r2 * 4.0) * prior_w) / \
        jnp.maximum(w + prior_w, 1e-10)
    w2 = w + prior_w
    wsq2 = wsq + prior_w * prior_w
    ess2 = w2 * w2 / jnp.maximum(wsq2, 1e-10)

    pla = tree.pos.to_move[:, 0][:, None]
    self_u = jnp.where(pla == B.WHITE, u_avg, -u_avg)
    var = jnp.maximum(usq_avg - u_avg * u_avg, 0.0)
    radius = jnp.sqrt(var / jnp.maximum(ess2, 1e-10)) * sp.lcb_stdevs
    good = exists & (w > 0)
    lcb = jnp.where(good, self_u - radius, -radius_max)
    return exists, good, w, self_u, radius, lcb


def child_analysis_extras(result: SearchResult, sp: SearchParamsArr) -> dict:
    """Reporting-only per-root-child stats for moveInfos
    (searchresults.cpp getJson: lcb / utilityLcb / scoreStdev / weight).

    Returns dict of [G, A] arrays: "weight" (subtree weight sum),
    "utility_lcb" (WHITE-persp utility LCB, reference data.lcb),
    "radius" (utility LCB radius), "lcb" (the hacked winrate LCB of
    PlayUtils::getHackedLCBForWinrate, white-persp winrate scale), and
    "score_stdev" (subtree score stdev, data.scoreStdev)."""
    tree = result.ss.tree
    exists, good, w, self_u, radius, lcb = _child_lcb_radius(result, sp)
    pla = tree.pos.to_move[:, 0][:, None]
    white_lcb = jnp.where(pla == B.WHITE, lcb, -lcb)

    children = tree.children[:, 0, :]
    c = jnp.maximum(children, 0)

    def gat(arr):
        return jnp.take_along_axis(arr, c, axis=1)

    winv = 1.0 / jnp.maximum(w, 1e-10)
    wl_avg = gat(tree.winloss_sum) * winv
    sc_avg = gat(tree.score_mean_sum) * winv
    scsq_avg = gat(tree.score_meansq_sum) * winv
    score_stdev = jnp.sqrt(jnp.maximum(scsq_avg - sc_avg * sc_avg, 0.0))

    # winrate-scale LCB (PlayUtils::getHackedLCBForWinrate,
    # playutils.cpp:345-361): the utility radius scaled down by how much
    # winrate matters within utility, applied in the mover's direction
    hack = 0.5 * sp.win_loss_utility_factor / (
        sp.win_loss_utility_factor + sp.static_score_utility_factor
        + sp.dynamic_score_utility_factor + 1e-20)
    winrate = 0.5 * (1.0 + wl_avg)
    hacked = jnp.where(pla == B.WHITE, winrate - radius * hack,
                       winrate + radius * hack)
    return {"weight": w, "utility_lcb": white_lcb, "radius": radius,
            "lcb": hacked, "score_stdev": score_stdev, "exists": good}


def _lcb_adjusted_selection_weights(result: SearchResult,
                                    sp: SearchParamsArr) -> jax.Array:
    """Per-game play-selection weights with the LCB bonus.

    Search::getSelfUtilityLCBAndRadius + the useLcbForSelection adjustment
    (searchhelpers.cpp:555-598, searchresults.cpp:206-240): the best-LCB
    child (among those with enough weight) gets its selection weight raised
    by the squared radius factor against every other child it dominates.
    """
    exists, good, w, self_u, radius, lcb = _child_lcb_radius(result, sp)
    psv = w  # play-selection values are edge weights
    best_w = jnp.max(psv, axis=1, keepdims=True)
    eligible = good & (psv >= sp.min_visit_prop_for_lcb * best_w)
    lcb_elig = jnp.where(eligible, lcb, -jnp.inf)
    best_idx = jnp.argmax(lcb_elig, axis=1)
    best_lcb = jnp.take_along_axis(lcb_elig, best_idx[:, None], axis=1)

    excess = best_lcb - lcb                               # [G, A]
    radius_factor = (radius + excess) / (radius + 0.20 * excess)
    lbound = jnp.where(good & (excess >= 0),
                       radius_factor * radius_factor * psv, 0.0)
    bonus = jnp.max(lbound, axis=1)                       # [G]
    any_elig = jnp.any(eligible, axis=1)
    new_best = jnp.maximum(jnp.take_along_axis(psv, best_idx[:, None],
                                               axis=1)[:, 0], bonus)
    psv_adj = psv.at[jnp.arange(psv.shape[0]), best_idx].set(
        jnp.where(any_elig, new_best, psv[jnp.arange(psv.shape[0]), best_idx]))
    return jnp.where(sp.use_lcb_for_selection, psv_adj, psv)


def choose_moves(result: SearchResult, sp: SearchParamsArr,
                 move_nums: jax.Array, rng: jax.Array) -> jax.Array:
    """Temperature-based move selection from root edge weights with optional
    LCB adjustment (searchresults.cpp getChosenMoveLoc; temperature halflife
    schedule)."""
    psv = _lcb_adjusted_selection_weights(result, sp)         # [G, A]
    has = result.child_visits > 0
    psv = jnp.where(has, psv, 0.0)
    temp = sp.chosen_move_temperature + (
        sp.chosen_move_temperature_early - sp.chosen_move_temperature) * \
        jnp.exp2(-move_nums.astype(jnp.float32) /
                 sp.chosen_move_temperature_halflife)          # [G]
    logv = jnp.where(has, jnp.log(jnp.maximum(psv, 1e-10)), -jnp.inf)
    maxlog = jnp.max(logv, axis=1, keepdims=True)
    t = jnp.maximum(temp, 1e-4)[:, None]
    logits = (logv - maxlog) / t
    g = psv.shape[0]
    keys = jax.random.split(rng, g)
    sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, logits)
    greedy = jnp.argmax(jnp.where(has, psv, -1.0), axis=1)
    return jnp.where(temp < 1e-3, greedy, sampled).astype(jnp.int32)
