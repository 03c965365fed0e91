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

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.models import features as F
from katago_tpu.search.params import SearchParamsArr

TOTALCHILDWEIGHT_PUCT_OFFSET = 0.01
ILLEGAL = -1e30


class Tree(NamedTuple):
    """Single-game node pool; every array's leading dim is max_nodes."""
    pos: H.PosState              # per-node position ([N, ...] leaves)
    ko_hash: jax.Array           # uint32[N, 2] node's superko hash
    parent: jax.Array            # int32[N]
    parent_action: jax.Array     # int32[N]
    depth: jax.Array             # int32[N]
    children: jax.Array          # int32[N, A], -1 = none
    policy: jax.Array            # float32[N, A], -1 = illegal
    visits: jax.Array            # int32[N]
    weight_sum: jax.Array        # float32[N]
    utility_sum: jax.Array       # float32[N] (white's perspective)
    utility_sq_sum: jax.Array    # float32[N]
    winloss_sum: jax.Array      # float32[N] (white's perspective)
    score_mean_sum: jax.Array    # float32[N]
    lead_sum: jax.Array          # float32[N]
    nn_utility: jax.Array        # float32[N] utility from this node's NN eval
    nn_winloss: jax.Array        # float32[N]
    nn_score_mean: jax.Array     # float32[N]
    nn_score_stdev: jax.Array    # float32[N]
    num_nodes: jax.Array         # int32 scalar


class SearchState(NamedTuple):
    """Tree + per-game search context."""
    tree: Tree
    rules: H.RulesArr
    root_hist: jax.Array         # uint32[MAX_HIST, 2] game history before root
    root_hist_len: jax.Array     # int32
    dyn_score_center: jax.Array  # float32
    sqrt_board_area: jax.Array   # float32


class LeafEval(NamedTuple):
    """Per-game NN (or terminal) evaluation of this playout's leaf."""
    utility: jax.Array
    winloss: jax.Array
    score_mean: jax.Array
    score_stdev: jax.Array
    lead: jax.Array
    policy: jax.Array            # f32[A] prior (-1 illegal)
    weight: jax.Array            # f32 backup weight


def empty_tree(size: int, max_nodes: int) -> Tree:
    nn = size * size
    a = nn + 1
    n = max_nodes
    pos1 = H.new_pos(size)
    pos = jax.tree.map(lambda x: jnp.broadcast_to(x, (n,) + x.shape).copy(), pos1)
    return Tree(
        pos=pos,
        ko_hash=jnp.zeros((n, 2), jnp.uint32),
        parent=jnp.full((n,), -1, jnp.int32),
        parent_action=jnp.full((n,), -1, jnp.int32),
        depth=jnp.zeros((n,), jnp.int32),
        children=jnp.full((n, a), -1, jnp.int32),
        policy=jnp.full((n, a), -1.0, jnp.float32),
        visits=jnp.zeros((n,), jnp.int32),
        weight_sum=jnp.zeros((n,), jnp.float32),
        utility_sum=jnp.zeros((n,), jnp.float32),
        utility_sq_sum=jnp.zeros((n,), jnp.float32),
        winloss_sum=jnp.zeros((n,), jnp.float32),
        score_mean_sum=jnp.zeros((n,), jnp.float32),
        lead_sum=jnp.zeros((n,), jnp.float32),
        nn_utility=jnp.zeros((n,), jnp.float32),
        nn_winloss=jnp.zeros((n,), jnp.float32),
        nn_score_mean=jnp.zeros((n,), jnp.float32),
        nn_score_stdev=jnp.zeros((n,), jnp.float32),
        num_nodes=jnp.int32(0),
    )


def score_value(score_white: jax.Array, center: jax.Array,
                scale: jax.Array, sqrt_area: jax.Array) -> jax.Array:
    """ScoreValue::whiteScoreValueOfScoreSmoothNoDrawAdjust (nninputs.cpp:59)."""
    return jnp.arctan((score_white - center) / (scale * sqrt_area)) * (2.0 / jnp.pi)


def utility_of(winloss_white, score_mean_white, sp: SearchParamsArr,
               st_center0, dyn_center, sqrt_area) -> jax.Array:
    """winLoss + static + dynamic score utility (searchupdatehelpers.cpp:24)."""
    static_sv = score_value(score_mean_white, st_center0, jnp.float32(1.0), sqrt_area)
    dyn_sv = score_value(score_mean_white, dyn_center,
                         sp.dynamic_score_center_scale, sqrt_area)
    return (sp.win_loss_utility_factor * winloss_white
            + sp.static_score_utility_factor * static_sv
            + sp.dynamic_score_utility_factor * dyn_sv)


def _white_persp(x_mover: jax.Array, to_move: jax.Array) -> jax.Array:
    """Flip a mover-perspective value to White's perspective."""
    return jnp.where(to_move == B.WHITE, x_mover, -x_mover)


class PathSel(NamedTuple):
    path_nodes: jax.Array    # int32[MAX_DEPTH] (-1 pad)
    path_len: jax.Array      # int32: number of valid path entries
    leaf_parent: jax.Array   # int32 node to expand from (or terminal node)
    leaf_action: jax.Array   # int32 action to expand (-1 if terminal/revisit)
    is_terminal: jax.Array   # bool: leaf is a finished game (or depth cap)
    terminal_node: jax.Array  # int32


def select_path(ss: SearchState, sp: SearchParamsArr, max_depth: int) -> PathSel:
    """PUCT descent from the root; single game (vmap over batch)."""
    tree = ss.tree

    def puct_action(node):
        children = tree.children[node]                     # [A]
        pol = tree.policy[node]                            # [A]
        has_child = children >= 0
        cidx = jnp.maximum(children, 0)
        cw = jnp.where(has_child, tree.weight_sum[cidx], 0.0)
        cu = jnp.where(has_child,
                       tree.utility_sum[cidx] / jnp.maximum(cw, 1e-10), 0.0)
        total_cw = jnp.sum(cw)
        visited_mass = jnp.sum(jnp.where(has_child & (pol >= 0), pol, 0.0))

        w = jnp.maximum(tree.weight_sum[node], 1e-10)
        parent_utility = tree.utility_sum[node] / w
        utility_sq_avg = tree.utility_sq_sum[node] / w
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

        is_root = node == 0
        fpu_red = jnp.where(is_root, sp.root_fpu_reduction_max,
                            sp.fpu_reduction_max)
        fpu_loss = jnp.where(is_root, sp.root_fpu_loss_prop, sp.fpu_loss_prop)
        parent_u_fpu = (sp.fpu_parent_weight * tree.nn_utility[node]
                        + (1.0 - sp.fpu_parent_weight) * parent_utility)
        utility_radius = (sp.win_loss_utility_factor
                          + sp.static_score_utility_factor
                          + sp.dynamic_score_utility_factor)
        pla = tree.pos.to_move[node]
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
        value_comp = jnp.where(is_white, child_util, -child_util)
        explore_comp = explore_scaling * pol / (1.0 + cw)
        score = jnp.where(pol >= 0, explore_comp + value_comp, ILLEGAL)
        return jnp.argmax(score).astype(jnp.int32)

    def body(i, carry):
        cur, done, path_nodes, path_len, leaf_parent, leaf_action, \
            is_terminal, terminal_node = carry
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
        done = done | hit_terminal | expanding
        cur = jnp.where(descending, jnp.maximum(child, 0), cur)
        return (cur, done, path_nodes, path_len, leaf_parent, leaf_action,
                is_terminal, terminal_node)

    init = (jnp.int32(0), jnp.bool_(False),
            jnp.full((max_depth,), -1, jnp.int32), jnp.int32(0),
            jnp.int32(0), jnp.int32(-1), jnp.bool_(False), jnp.int32(0))
    cur, done, path_nodes, path_len, leaf_parent, leaf_action, \
        is_terminal, terminal_node = jax.lax.fori_loop(0, max_depth, body, init)
    # depth cap without resolution: treat current node as terminal-revisit
    is_terminal = is_terminal | ~done
    terminal_node = jnp.where(~done, cur, terminal_node)
    return PathSel(path_nodes, path_len, leaf_parent, leaf_action,
                   is_terminal, terminal_node)


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

    leaf_gs = H.GameState(pos=leaf_pos, rules=ss.rules,
                          ko_hash_hist=hist, hist_len=hist_len)
    return leaf_pos, leaf_ko_hash, leaf_gs


def terminal_eval(ss: SearchState, node: jax.Array, sp: SearchParamsArr,
                  size: int) -> LeafEval:
    """Utility backed up when a playout ends at an existing node.

    Finished game -> exact final-score utility (the reference's terminal
    values). Depth-capped playout on a live node -> the node's current
    averaged stats (a weight-1 revisit, value-neutral).
    """
    tree = ss.tree
    pos = jax.tree.map(lambda a: a[node], tree.pos)
    _, white_minus_black = H.final_score_area_pos(pos, ss.rules, size)
    winloss = jnp.sign(white_minus_black)  # draws -> 0
    util = utility_of(winloss, white_minus_black, sp, jnp.float32(0.0),
                      ss.dyn_score_center, ss.sqrt_board_area)

    w = jnp.maximum(tree.weight_sum[node], 1e-10)
    is_over = tree.pos.game_over[node]
    util = jnp.where(is_over, util, tree.utility_sum[node] / w)
    winloss = jnp.where(is_over, winloss, tree.winloss_sum[node] / w)
    score = jnp.where(is_over, white_minus_black, tree.score_mean_sum[node] / w)
    lead = jnp.where(is_over, white_minus_black, tree.lead_sum[node] / w)
    a = tree.policy.shape[1]
    return LeafEval(utility=util, winloss=winloss,
                    score_mean=score,
                    score_stdev=jnp.float32(0.0),
                    lead=lead,
                    policy=jnp.full((a,), -1.0, jnp.float32),
                    weight=jnp.float32(1.0))


def insert_and_backup(ss: SearchState, sel: PathSel, leaf_pos: H.PosState,
                      leaf_ko_hash: jax.Array, ev: LeafEval,
                      superko_illegal: jax.Array) -> SearchState:
    """Allocate the leaf node (unless terminal/full/illegal) and back up."""
    tree = ss.tree
    n = tree.visits.shape[0]

    can_alloc = (~sel.is_terminal) & (tree.num_nodes < n) & ~superko_illegal
    new_idx = jnp.where(can_alloc, tree.num_nodes, n - 1)  # dummy last slot

    def set_at(arr, idx, val):
        return arr.at[idx].set(jnp.where(can_alloc, val, arr[idx]))

    pos = jax.tree.map(
        lambda store, v: store.at[new_idx].set(
            jnp.where(can_alloc, v, store[new_idx])), tree.pos, leaf_pos)
    tree = tree._replace(
        pos=pos,
        ko_hash=set_at(tree.ko_hash, new_idx, leaf_ko_hash),
        parent=set_at(tree.parent, new_idx, sel.leaf_parent),
        parent_action=set_at(tree.parent_action, new_idx, sel.leaf_action),
        depth=set_at(tree.depth, new_idx, tree.depth[sel.leaf_parent] + 1),
        policy=set_at(tree.policy, new_idx, ev.policy),
        nn_utility=set_at(tree.nn_utility, new_idx, ev.utility),
        nn_winloss=set_at(tree.nn_winloss, new_idx, ev.winloss),
        nn_score_mean=set_at(tree.nn_score_mean, new_idx, ev.score_mean),
        nn_score_stdev=set_at(tree.nn_score_stdev, new_idx, ev.score_stdev),
        num_nodes=tree.num_nodes + can_alloc.astype(jnp.int32),
    )
    # link parent -> child
    children = tree.children.at[sel.leaf_parent, jnp.maximum(sel.leaf_action, 0)].set(
        jnp.where(can_alloc, new_idx,
                  tree.children[sel.leaf_parent, jnp.maximum(sel.leaf_action, 0)]))
    # superko-illegal expansion: mark prior illegal so it's never tried again
    policy = tree.policy.at[sel.leaf_parent, jnp.maximum(sel.leaf_action, 0)].set(
        jnp.where(superko_illegal & ~sel.is_terminal, -1.0,
                  tree.policy[sel.leaf_parent, jnp.maximum(sel.leaf_action, 0)]))
    tree = tree._replace(children=children, policy=policy)

    # backup along path + the newly created node. A terminal leaf is already
    # the final path entry (select_path records it before stopping), so only
    # a freshly allocated node is appended here.
    pad = n - 1
    upd_nodes = jnp.concatenate([
        jnp.where(sel.path_nodes >= 0, sel.path_nodes, pad),
        jnp.where(can_alloc, new_idx, pad)[None],
    ])
    valid = jnp.concatenate([
        sel.path_nodes >= 0,
        can_alloc[None],
    ])
    # a superko-rejected expansion backs up nothing — the playout is void
    # (its prior was just marked illegal; the next sim picks another move)
    valid = valid & ~superko_illegal
    # deduplicate is unnecessary: path nodes are distinct in a tree
    wt = jnp.where(valid, ev.weight, 0.0)
    tree = tree._replace(
        visits=tree.visits.at[upd_nodes].add(valid.astype(jnp.int32)),
        weight_sum=tree.weight_sum.at[upd_nodes].add(wt),
        utility_sum=tree.utility_sum.at[upd_nodes].add(wt * ev.utility),
        utility_sq_sum=tree.utility_sq_sum.at[upd_nodes].add(
            wt * ev.utility * ev.utility),
        winloss_sum=tree.winloss_sum.at[upd_nodes].add(wt * ev.winloss),
        score_mean_sum=tree.score_mean_sum.at[upd_nodes].add(wt * ev.score_mean),
        lead_sum=tree.lead_sum.at[upd_nodes].add(wt * ev.lead),
    )
    # undo any accidental write to the dummy slot
    return ss._replace(tree=tree)


def make_nn_evaluator(model_apply: Callable, model_params: Any, size: int):
    """Returns batched_eval(leaf_gs_batch, feat_params, rng) -> per-game NN
    outputs dict; the only cross-game-batched piece of the search."""

    def batched_eval(leaf_gs, feat_params):
        sp_feat, gl_feat = jax.vmap(
            F.fill_features_v7, in_axes=(0, None, None))(leaf_gs, size, feat_params)
        g = sp_feat.shape[0]
        sp_feat = sp_feat.reshape(g, size, size, F.NUM_SPATIAL_V7)
        raw = model_apply(model_params, sp_feat, gl_feat)
        legal = jax.vmap(H.legal_moves, in_axes=(0, None))(leaf_gs, size)
        return raw, legal

    return batched_eval


def nn_leaf_eval(raw: dict, legal: jax.Array, gs_to_move: jax.Array,
                 sp: SearchParamsArr, dyn_center, sqrt_area,
                 policy_temp: jax.Array) -> LeafEval:
    """Convert one game's NN outputs (mover perspective) to a LeafEval
    (white perspective utilities, masked softmax prior)."""
    value_probs = jax.nn.softmax(raw["value_logits"], axis=-1)
    winloss_mover = value_probs[0] - value_probs[1]
    mv = raw["miscvalue"]
    score_mover = mv[0] * 20.0
    stdev = jax.nn.softplus(mv[1]) * 20.0
    lead_mover = mv[2] * 20.0

    winloss_w = _white_persp(winloss_mover, gs_to_move)
    score_w = _white_persp(score_mover, gs_to_move)
    lead_w = _white_persp(lead_mover, gs_to_move)
    util = utility_of(winloss_w, score_w, sp, jnp.float32(0.0),
                      dyn_center, sqrt_area)

    logits = raw["policy_logits"][0]                 # [A] channel 0
    logits = logits / jnp.maximum(sp.nn_policy_temperature, 1e-6)
    logits = logits / jnp.maximum(policy_temp, 1e-6)
    logits = jnp.where(legal, logits, -1e30)
    pol = jax.nn.softmax(logits)
    pol = jnp.where(legal, pol, -1.0)
    return LeafEval(utility=util, winloss=winloss_w, score_mean=score_w,
                    score_stdev=stdev, lead=lead_w, policy=pol,
                    weight=jnp.float32(1.0))


class SearchResult(NamedTuple):
    ss: SearchState              # final search state (tree reusable later)
    root_visits: jax.Array      # int32[G]
    child_visits: jax.Array      # int32[G, A] per-action edge visits
    root_policy_prior: jax.Array  # f32[G, A]
    root_winloss: jax.Array      # f32[G] (white persp, tree-averaged)
    root_score_mean: jax.Array  # f32[G]
    root_lead: jax.Array         # f32[G]
    root_utility: jax.Array      # f32[G]


def run_search(model_apply: Callable, model_params: Any,
               roots: H.GameState, sp: SearchParamsArr,
               rng: jax.Array, *, size: int, num_sims: int,
               max_nodes: int, max_depth: int = 64) -> SearchResult:
    """Run num_sims playouts for a batch of games. roots: GameState[G]."""
    nn = size * size
    a = nn + 1
    g = roots.hist_len.shape[0]
    evaluator = make_nn_evaluator(model_apply, model_params, size)

    feat_params = F.FeatureParams(
        draw_equiv_wins_for_white=sp.draw_equivalent_wins_for_white,
        playout_doubling_advantage=sp.playout_doubling_advantage,
        conservative_pass=sp.conservative_pass,
    )

    # ---- initialize per-game search state with the root node ----
    trees = jax.vmap(lambda _: empty_tree(size, max_nodes))(jnp.arange(g))
    root_ko_hash = jax.vmap(
        lambda gs: H._ko_hash(gs.pos.board.pos_hash, gs.pos.to_move,
                              gs.rules.ko_rule))(roots)

    ss = SearchState(
        tree=trees,
        rules=roots.rules,
        root_hist=roots.ko_hash_hist,
        root_hist_len=roots.hist_len,
        dyn_score_center=jnp.zeros((g,), jnp.float32),
        sqrt_board_area=jnp.full((g,), float(np.sqrt(nn)), jnp.float32),
    )

    # root NN eval
    raw, legal = evaluator(roots, feat_params)
    root_policy_temp = jnp.broadcast_to(sp.root_policy_temperature, (g,))

    def eval_root(raw_i, legal_i, to_move, dyn_c, sqrt_a, ptemp):
        return nn_leaf_eval(raw_i, legal_i, to_move, sp, dyn_c, sqrt_a, ptemp)

    root_ev = jax.vmap(eval_root)(
        raw, legal, roots.pos.to_move, ss.dyn_score_center,
        ss.sqrt_board_area, root_policy_temp)

    # dynamic score center from the root NN (search.cpp:1148-1150)
    expected = root_ev.score_mean
    center = expected * (1.0 - sp.dynamic_score_center_zero_weight)
    cap = ss.sqrt_board_area * sp.dynamic_score_center_scale
    ss = ss._replace(dyn_score_center=jnp.clip(center, expected - cap,
                                               expected + cap))

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
    root_ev = root_ev._replace(policy=root_pol)

    # install root node (index 0) per game
    def install_root(ss_tree, gs, kh, ev):
        tree = ss_tree
        pos = jax.tree.map(lambda store, v: store.at[0].set(v), tree.pos, gs.pos)
        tree = tree._replace(
            pos=pos,
            ko_hash=tree.ko_hash.at[0].set(kh),
            policy=tree.policy.at[0].set(ev.policy),
            visits=tree.visits.at[0].set(1),
            weight_sum=tree.weight_sum.at[0].set(ev.weight),
            utility_sum=tree.utility_sum.at[0].set(ev.weight * ev.utility),
            utility_sq_sum=tree.utility_sq_sum.at[0].set(
                ev.weight * ev.utility * ev.utility),
            winloss_sum=tree.winloss_sum.at[0].set(ev.weight * ev.winloss),
            score_mean_sum=tree.score_mean_sum.at[0].set(ev.weight * ev.score_mean),
            lead_sum=tree.lead_sum.at[0].set(ev.weight * ev.lead),
            nn_utility=tree.nn_utility.at[0].set(ev.utility),
            nn_winloss=tree.nn_winloss.at[0].set(ev.winloss),
            nn_score_mean=tree.nn_score_mean.at[0].set(ev.score_mean),
            nn_score_stdev=tree.nn_score_stdev.at[0].set(ev.score_stdev),
            num_nodes=jnp.int32(1),
        )
        return tree

    ss = ss._replace(tree=jax.vmap(install_root)(ss.tree, roots,
                                                 root_ko_hash, root_ev))

    # ---- playout loop ----
    def one_sim(carry, _):
        ss, rng = carry
        sel = jax.vmap(select_path, in_axes=(0, None, None))(ss, sp, max_depth)
        leaf_pos, leaf_kh, leaf_gs = jax.vmap(
            make_leaf_gamestate, in_axes=(0, 0, None, None))(ss, sel, size, max_depth)

        raw, legal = evaluator(leaf_gs, feat_params)
        ptemp = jnp.ones((g,), jnp.float32)
        nn_ev = jax.vmap(
            lambda r, l, tm, dc, sa, pt: nn_leaf_eval(r, l, tm, sp, dc, sa, pt)
        )(raw, legal, leaf_gs.pos.to_move, ss.dyn_score_center,
          ss.sqrt_board_area, ptemp)
        term_ev = jax.vmap(
            lambda s, node: terminal_eval(s, node, sp, size)
        )(ss, sel.terminal_node)
        ev = jax.tree.map(
            lambda t, n: jnp.where(
                sel.is_terminal.reshape((-1,) + (1,) * (n.ndim - 1)), t, n),
            term_ev, nn_ev)

        # superko along path: did the expansion recreate a position?
        # leaf_gs history already includes the leaf hash at slot hist_len-1;
        # check for an identical hash earlier in the history.
        def superko_check(gs_i, kh):
            max_hist = gs_i.ko_hash_hist.shape[0]
            idx = jnp.arange(max_hist)
            valid = idx < (gs_i.hist_len - 1)
            eq = jnp.all(gs_i.ko_hash_hist == kh[None, :], axis=-1)
            return jnp.any(eq & valid)

        superko_illegal = jax.vmap(superko_check)(leaf_gs, leaf_kh) \
            & ~sel.is_terminal
        # pass never violates superko-based bans in our engine semantics
        superko_illegal = superko_illegal & (sel.leaf_action < nn)

        ss = jax.vmap(insert_and_backup)(ss, sel, leaf_pos, leaf_kh, ev,
                                         superko_illegal)
        return (ss, rng), None

    (ss, rng), _ = jax.lax.scan(one_sim, (ss, rng), None, length=num_sims)

    # ---- results ----
    tree = ss.tree
    child_idx = jnp.maximum(tree.children[:, 0, :], 0)
    has_child = tree.children[:, 0, :] >= 0
    cvis = jnp.where(has_child,
                     jnp.take_along_axis(tree.visits, child_idx, axis=1), 0)
    root_w = jnp.maximum(tree.weight_sum[:, 0], 1e-10)
    return SearchResult(
        ss=ss,
        root_visits=tree.visits[:, 0],
        child_visits=cvis,
        root_policy_prior=tree.policy[:, 0, :],
        root_winloss=tree.winloss_sum[:, 0] / root_w,
        root_score_mean=tree.score_mean_sum[:, 0] / root_w,
        root_lead=tree.lead_sum[:, 0] / root_w,
        root_utility=tree.utility_sum[:, 0] / root_w,
    )


def choose_moves(result: SearchResult, sp: SearchParamsArr,
                 move_nums: jax.Array, rng: jax.Array) -> jax.Array:
    """Temperature-based move selection from root edge visits
    (searchresults.cpp getChosenMoveLoc; temperature halflife schedule)."""
    cvis = result.child_visits.astype(jnp.float32)            # [G, A]
    temp = sp.chosen_move_temperature + (
        sp.chosen_move_temperature_early - sp.chosen_move_temperature) * \
        jnp.exp2(-move_nums.astype(jnp.float32) /
                 sp.chosen_move_temperature_halflife)          # [G]
    has = cvis > 0
    # temperature 0 -> argmax
    logv = jnp.where(has, jnp.log(jnp.maximum(cvis, 1e-10)), -jnp.inf)
    maxlog = jnp.max(logv, axis=1, keepdims=True)
    t = jnp.maximum(temp, 1e-4)[:, None]
    logits = (logv - maxlog) / t
    g = cvis.shape[0]
    keys = jax.random.split(rng, g)
    sampled = jax.vmap(lambda k, l: jax.random.categorical(k, l))(keys, logits)
    greedy = jnp.argmax(jnp.where(has, cvis, -1.0), axis=1)
    return jnp.where(temp < 1e-3, greedy, sampled).astype(jnp.int32)
