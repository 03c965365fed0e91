"""Array-MCTS tests: mechanics (visit conservation, legality, determinism)
and value-seeking behavior via stub models with known preferences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import board as B
from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParams

SIZE = 5
NN = SIZE * SIZE
A = NN + 1


def stub_model(value_fn):
    """model_apply(params, spatial, global) -> raw dict.

    value_fn(spatial) -> winloss in [-1,1] from the mover's perspective,
    computed per game from the featurized position ([G,H,W,22])."""

    def apply(params, spatial, glob):
        g = spatial.shape[0]
        win_minus_loss = value_fn(spatial)  # [G]
        p_win = 0.5 * (1.0 + win_minus_loss)
        logits = jnp.stack([jnp.log(jnp.maximum(p_win, 1e-9)),
                            jnp.log(jnp.maximum(1.0 - p_win, 1e-9)),
                            jnp.full((g,), -20.0)], axis=-1)
        return {
            "policy_logits": jnp.zeros((g, 6, A)),
            "value_logits": logits,
            "miscvalue": jnp.zeros((g, 10)),
            "moremiscvalue": jnp.zeros((g, 8)),
        }

    return apply


def neutral_model():
    return stub_model(lambda spatial: jnp.zeros((spatial.shape[0],)))


def make_roots(g=2, rules=None, moves=()):
    rules = rules or R.Rules.tromp_taylorish()
    gs = H.new_game(SIZE, H.RulesArr.from_rules(rules), 128)
    for mv in moves:
        gs, _ = H.step(gs, jnp.int32(mv), SIZE)
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (g,) + x.shape).copy(), gs)


def run(model_apply, roots, sp=None, num_sims=40, seed=0):
    sp = (sp or SearchParams()).to_arr()
    fn = jax.jit(lambda r, k: mcts.run_search(
        model_apply, None, r, sp, k, size=SIZE, num_sims=num_sims,
        max_nodes=num_sims + 3, max_depth=32))
    return fn(roots, jax.random.PRNGKey(seed))


def test_visit_conservation_and_legality():
    roots = make_roots(g=3)
    res = run(neutral_model(), roots, num_sims=30)
    rv = np.asarray(res.root_visits)
    cv = np.asarray(res.child_visits)
    # every sim lands somewhere: root visits = sims + root eval
    assert (rv == 31).all()
    # children account for all non-root visits
    np.testing.assert_array_equal(cv.sum(axis=1), rv - 1)
    # no visits on occupied/illegal points (empty board: all legal + pass)
    prior = np.asarray(res.root_policy_prior)
    assert (prior[:, :NN] >= 0).all()


def test_search_is_deterministic():
    roots = make_roots(g=2)
    r1 = run(neutral_model(), roots, num_sims=25, seed=7)
    r2 = run(neutral_model(), roots, num_sims=25, seed=7)
    np.testing.assert_array_equal(np.asarray(r1.child_visits),
                                  np.asarray(r2.child_visits))
    assert np.allclose(np.asarray(r1.root_utility), np.asarray(r2.root_utility))


def test_search_seeks_high_value_move():
    """Stub: positions where the mover's perspective value is high iff a
    stone sits at the center. Black searching should pile visits there."""
    center = B.loc_of_xy(2, 2, SIZE)

    def value_fn(spatial):
        # plane 2 = opponent stones: after black plays center, white is the
        # mover and sees a black (opp) stone at center -> mover losing
        flat = spatial.reshape(spatial.shape[0], NN, 22)
        black_at_center_for_white = flat[:, center, 2]
        return -0.9 * black_at_center_for_white

    roots = make_roots(g=2)
    res = run(stub_model(value_fn), roots, num_sims=60)
    cv = np.asarray(res.child_visits)
    assert (cv.argmax(axis=1) == center).all()
    assert (cv[:, center] > 20).all()


def test_search_never_visits_illegal():
    # position with an occupied point and a simple ko ban
    moves = [B.loc_of_xy(0, 0, SIZE)]
    roots = make_roots(g=2, moves=moves)
    res = run(neutral_model(), roots, num_sims=30)
    cv = np.asarray(res.child_visits)
    assert (cv[:, B.loc_of_xy(0, 0, SIZE)] == 0).all()
    prior = np.asarray(res.root_policy_prior)
    assert (prior[:, B.loc_of_xy(0, 0, SIZE)] < 0).all()


def test_terminal_pass_scoring_drives_choice():
    """Black is massively ahead on the board and white just passed. Passing
    ends the game with a huge black win; the terminal backup should make
    pass (or anything) winning, and utilities should reflect black lead."""
    stones = np.zeros(NN, np.int32)
    stones[:20] = B.BLACK  # 20 black stones, no white
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules(komi=0.5)), 128)
    gs = H.replace_pos(gs, board=gs.board._replace(stones=jnp.asarray(stones)),
                       consec_passes=jnp.int32(1),
                       to_move=jnp.int32(B.BLACK))
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (2,) + x.shape).copy(), gs)
    res = run(neutral_model(), roots, num_sims=50)
    # tree explored pass -> terminal; root winloss (white persp) clearly negative
    assert (np.asarray(res.root_winloss) < -0.2).all()
    cv = np.asarray(res.child_visits)
    assert (cv[:, NN] > 0).all()  # pass was explored


def test_choose_moves_temperature_zero_is_argmax():
    roots = make_roots(g=2)
    res = run(neutral_model(), roots, num_sims=30)
    sp = SearchParams().to_arr()  # chosen_move_temperature = 0
    mv = mcts.choose_moves(res, sp, jnp.zeros((2,), jnp.int32),
                           jax.random.PRNGKey(0))
    cv = np.asarray(res.child_visits)
    np.testing.assert_array_equal(np.asarray(mv), cv.argmax(axis=1))


def test_dirichlet_noise_changes_prior():
    roots = make_roots(g=1)
    res_plain = run(neutral_model(), roots, num_sims=5,
                    sp=SearchParams(root_noise_enabled=False))
    res_noise = run(neutral_model(), roots, num_sims=5,
                    sp=SearchParams(root_noise_enabled=True))
    p1 = np.asarray(res_plain.root_policy_prior)
    p2 = np.asarray(res_noise.root_policy_prior)
    assert not np.allclose(p1, p2)
    legal = p2 >= 0
    # the pool stores priors at float16 (mcts.POL_DT; the reference
    # likewise stores f16 policyProbs) — the renormalized sum carries
    # that quantization
    np.testing.assert_allclose(p2[legal].sum(), 1.0, rtol=6e-4)


def test_superko_blocked_in_tree():
    """Root where the only superko trap exists: the search must never
    create a child that recreates a previous whole-board position."""
    # build the 2-stone-suicide cycle from test_history via real play
    size = SIZE
    rules = R.Rules(ko_rule=R.KO_POSITIONAL, multi_stone_suicide_legal=True)
    gs = H.new_game(size, H.RulesArr.from_rules(rules), 128)
    seq = [(1, 0), (4, 4), (1, 1), (3, 4), (0, 2), (4, 3), None, (0, 0), None]
    for m in seq:
        loc = NN if m is None else B.loc_of_xy(m[0], m[1], size)
        gs, _ = H.step(gs, jnp.int32(loc), size)
    # white to move; a2=(0,1) would recreate an earlier position
    a2 = B.loc_of_xy(0, 1, size)
    legal = np.asarray(H.legal_moves(gs, size))
    assert not legal[a2]
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(), gs)
    res = run(neutral_model(), roots, num_sims=40)
    assert np.asarray(res.child_visits)[0, a2] == 0
    assert np.asarray(res.root_policy_prior)[0, a2] < 0


def test_uncertainty_weighting_changes_weights():
    """With use_uncertainty, backup weights come from the shortterm error
    heads, so root weight_sum != root visits."""
    def apply_unc(params, spatial, glob):
        g = spatial.shape[0]
        out = stub_model(lambda s: jnp.zeros((s.shape[0],)))(params, spatial, glob)
        # large shortterm errors -> low weight
        out["moremiscvalue"] = jnp.ones((g, 8)) * 2.0
        return out

    roots = make_roots(g=2)
    sp_on = SearchParams(use_uncertainty=True)
    res = run(apply_unc, roots, sp=sp_on, num_sims=20)
    w = np.asarray(res.ss.tree.weight_sum[:, 0])
    v = np.asarray(res.root_visits)
    assert not np.allclose(w, v)  # weights deviate from visit counts
    assert (w > 0).all() and np.isfinite(w).all()

    sp_off = SearchParams(use_uncertainty=False)
    res2 = run(neutral_model(), roots, sp=sp_off, num_sims=20)
    np.testing.assert_allclose(np.asarray(res2.ss.tree.weight_sum[:, 0]),
                               np.asarray(res2.root_visits), rtol=1e-5)


def test_lcb_selection_smoke():
    roots = make_roots(g=2)
    res = run(neutral_model(), roots, num_sims=30)
    sp = SearchParams(use_lcb_for_selection=True).to_arr()
    mv = mcts.choose_moves(res, sp, jnp.zeros((2,), jnp.int32),
                           jax.random.PRNGKey(0))
    mv = np.asarray(mv)
    cv = np.asarray(res.child_visits)
    # chosen moves are visited, legal moves
    for g in range(2):
        assert cv[g, mv[g]] > 0
    # deterministic given temperature 0
    mv2 = np.asarray(mcts.choose_moves(res, sp, jnp.zeros((2,), jnp.int32),
                                       jax.random.PRNGKey(5)))
    np.testing.assert_array_equal(mv, mv2)


def test_recompute_backup_value_consistency():
    """Root stats must equal the weighted combination of child stats + own
    eval; with a value-seeking stub the root utility moves toward the best
    child rather than the plain average."""
    center = B.loc_of_xy(2, 2, SIZE)

    def value_fn(spatial):
        flat = spatial.reshape(spatial.shape[0], NN, 22)
        return -0.9 * flat[:, center, 2]

    roots = make_roots(g=1)
    res = run(stub_model(value_fn), roots, num_sims=60,
              sp=SearchParams(value_weight_exponent=0.5))
    tree = res.ss.tree
    w = float(np.asarray(tree.weight_sum[0, 0]))
    # winloss avg (white persp): black to move and winning via center ->
    # negative, and pulled toward the best child's value by downweighting
    root_wl = float(np.asarray(res.root_winloss[0]))
    assert root_wl < -0.2
    assert w > 10


def test_tree_reuse_extract_subtree():
    """extract_subtree re-roots at the played child: stats preserved,
    indices remapped, fresh fallback when unexpanded."""
    roots = make_roots(g=1)
    res = run(neutral_model(), roots, num_sims=40)
    tree1 = jax.tree.map(lambda a: a[0], res.ss.tree)
    cv = np.asarray(res.child_visits[0])
    a = int(cv.argmax())
    child = int(np.asarray(tree1.children)[0, a])
    assert child > 0
    sub = mcts.extract_subtree(tree1, jnp.int32(a))
    n_sub = int(sub.num_nodes)
    assert 1 <= n_sub <= int(tree1.num_nodes)
    # new root carries the child's stats
    assert int(sub.visits[0]) == int(np.asarray(tree1.visits)[child])
    assert float(sub.weight_sum[0]) == pytest.approx(
        float(np.asarray(tree1.weight_sum)[child]))
    # link consistency: every non-root node's parent is inside the subtree
    parent = np.asarray(sub.parent)[:n_sub]
    assert parent[0] == -1
    assert ((parent[1:] >= 0) & (parent[1:] < n_sub)).all()
    children = np.asarray(sub.children)[:n_sub]
    assert (children < n_sub).all()
    # unexpanded action -> empty result
    illegal = np.flatnonzero(cv == 0)
    empty = mcts.extract_subtree(tree1, jnp.int32(int(illegal[0])))
    has_child = int(np.asarray(tree1.children)[0, int(illegal[0])])
    if has_child < 0:
        assert int(empty.num_nodes) == 0


def test_tree_reuse_continues_search():
    """A reused search starts from the subtree's visits and still returns
    consistent results after the game steps forward."""
    from katago_tpu.game import history as Hm
    roots = make_roots(g=2)
    model = neutral_model()
    res = run(model, roots, num_sims=30)
    sp = SearchParams().to_arr()
    mv = mcts.choose_moves(res, sp, jnp.zeros((2,), jnp.int32),
                           jax.random.PRNGKey(0))
    games2, _ = jax.vmap(Hm.step, in_axes=(0, 0, None))(roots, mv, SIZE)
    res2 = mcts.run_search(model, None, games2, sp, jax.random.PRNGKey(1),
                           size=SIZE, num_sims=20, max_nodes=54,
                           prev_tree=res.ss.tree, prev_actions=mv)
    rv = np.asarray(res2.root_visits)
    # reused roots start with the child's prior visits, so totals exceed
    # a fresh 20-sim search wherever the played child had been explored
    prior = np.asarray(res.child_visits)[np.arange(2), np.asarray(mv)]
    for gidx in range(2):
        if prior[gidx] > 0:
            assert rv[gidx] >= 20 + prior[gidx] - 1
    assert np.isfinite(np.asarray(res2.root_winloss)).all()


def test_graph_search_transposition_sharing():
    """Two move orders reaching the same position share one node
    (MCGS-lite; searchnodetable / docs/GraphSearch.md)."""
    roots = make_roots(g=1)
    res_on = run(neutral_model(), roots, num_sims=60,
                 sp=SearchParams(use_graph_search=True))
    res_off = run(neutral_model(), roots, num_sims=60,
                  sp=SearchParams(use_graph_search=False))
    n_on = int(res_on.ss.tree.num_nodes[0])
    n_off = int(res_off.ss.tree.num_nodes[0])
    # transpositions (A,B) vs (B,A) are plentiful at depth 2 on a small
    # board with a uniform prior: the graph uses strictly fewer nodes
    assert n_on < n_off
    assert int(res_on.root_visits[0]) == 61  # playouts unaffected
    # linked children are consistent (no self/ancestor cycles at depth 1)
    tree = res_on.ss.tree
    children = np.asarray(tree.children[0])
    depth = np.asarray(tree.depth[0])
    for node in range(n_on):
        for c in children[node]:
            if c >= 0:
                assert depth[c] == depth[node] + 1


def test_subtree_value_bias_shifts_utility():
    """With subtreeValueBiasFactor on, repeated pattern errors shift node
    utilities; tables stay finite and the search still conserves visits."""
    roots = make_roots(g=2)

    def value_fn(spatial):
        flat = spatial.reshape(spatial.shape[0], NN, 22)
        return -0.5 * flat[:, B.loc_of_xy(2, 2, SIZE), 2]

    res = run(stub_model(value_fn), roots, num_sims=40,
              sp=SearchParams(subtree_value_bias_factor=0.30))
    assert int(res.root_visits[0]) == 41
    bs = np.asarray(res.ss.bias_sum)
    bw = np.asarray(res.ss.bias_weight)
    assert np.isfinite(bs).all() and np.isfinite(bw).all()
    assert (bw >= -1e-5).all()
    assert np.abs(bs).sum() > 0          # some deltas were published
    # off: tables untouched
    res0 = run(stub_model(value_fn), roots, num_sims=20,
               sp=SearchParams(subtree_value_bias_factor=0.0))
    assert np.abs(np.asarray(res0.ss.bias_sum)).sum() == 0.0


def test_policy_optimism_and_wide_root_noise():
    """policyOptimism blends the optimistic policy channel
    (trtbackend.cpp:2082); wideRootNoise flattens the root prior
    (searchexplorehelpers.cpp:89-90)."""

    def apply(params, spatial, glob):
        g = spatial.shape[0]
        pol = jnp.zeros((g, 6, A))
        pol = pol.at[:, 0, 3].set(4.0)     # normal policy peaks at 3
        pol = pol.at[:, 1, 7].set(4.0)     # optimistic policy peaks at 7
        return {
            "policy_logits": pol,
            "value_logits": jnp.zeros((g, 3)),
            "miscvalue": jnp.zeros((g, 10)),
            "moremiscvalue": jnp.zeros((g, 8)),
        }

    def go(sp):
        return run(apply, make_roots(g=1), sp=sp, num_sims=8)

    r0 = go(SearchParams(root_noise_enabled=False))
    r_opt = go(SearchParams(root_noise_enabled=False,
                            root_policy_optimism=1.0))
    r_wide = go(SearchParams(root_noise_enabled=False,
                             wide_root_noise=2.0))
    p0 = np.asarray(r0.root_policy_prior[0])
    po = np.asarray(r_opt.root_policy_prior[0])
    pw = np.asarray(r_wide.root_policy_prior[0])
    legal = p0 >= 0
    assert p0.argmax() == 3
    assert po.argmax() == 7          # optimism switched to channel 1
    assert pw[legal].max() < p0[legal].max()   # widened prior is flatter
    for r in (r0, r_opt, r_wide):
        assert (np.asarray(r.root_visits) == 9).all()


def test_root_ending_bonus():
    """getEndingWhiteScoreBonus (searchhelpers.cpp:351-420): settled
    territory fills are discouraged; dame/captures are not; territory
    rules discourage passing."""
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    32)
    # black wall on column 1: loc x=1 each row; black "owns" column 0
    for y in range(SIZE):
        gs = H.replace_pos(gs, to_move=jnp.int32(1))
        gs, _ = H.step(gs, jnp.int32(y * SIZE + 1), SIZE)
    own = np.zeros(SIZE * SIZE, np.float32)
    own[[y * SIZE for y in range(SIZE)]] = 1.0    # column 0: black-owned
    own[[y * SIZE + 1 for y in range(SIZE)]] = 1.0
    own[[y * SIZE + 4 for y in range(SIZE)]] = -1.0  # column 4: white's
    # black to move; ownership is white-persp, so black-owned = -1
    gs = H.replace_pos(gs, to_move=jnp.int32(1))
    sp = SearchParams(root_ending_bonus_points=0.5).to_arr()
    bonus = mcts.root_ending_bonus(gs, jnp.asarray(-own), sp, SIZE)
    bonus = np.asarray(bonus)
    # black playing in its own settled territory (column 0, not adjacent
    # to white): discouraged => bonus negative for black => positive in
    # white perspective? extra is root-player persp then flipped; black
    # root => white-persp bonus positive
    assert bonus[2 * SIZE + 0] > 0.0
    # neutral center point: no bonus
    assert bonus[2 * SIZE + 2] == 0.0
    # playing inside white's settled territory: also discouraged
    assert bonus[2 * SIZE + 4] > 0.0
    # area rules without button: pass not penalized
    assert bonus[SIZE * SIZE] == 0.0
    # territory rules: pass discouraged (2/3 points)
    jrules = R.Rules.parse("japanese")
    gs2 = H.replace_pos(gs._replace(rules=H.RulesArr.from_rules(jrules)),
                        to_move=jnp.int32(1))
    b2 = np.asarray(mcts.root_ending_bonus(gs2, jnp.asarray(-own), sp,
                                           SIZE))
    assert abs(b2[SIZE * SIZE] - 0.5 * 2.0 / 3.0) < 1e-6


def test_root_prune_useless_moves():
    """isAllowedRootMove (searchhelpers.cpp:311-341): after four opponent
    passes, pass-alive-area moves are pruned at the root."""
    # black corner group that is pass-alive on 5x5: eyes at 0 and 2,
    # fully enclosed by ONE chain (1,3 joined through 8)
    stones = [1, 3, 5, 6, 7, 8, 2 * SIZE + 0, 2 * SIZE + 1,
              2 * SIZE + 2, 2 * SIZE + 3]
    gs = H.new_game(SIZE, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    64)
    for l in stones:
        gs = H.replace_pos(gs, to_move=jnp.int32(1))
        gs, _ = H.step(gs, jnp.int32(l), SIZE)
    # opponent (white) passed 4 times, black moves between
    nnp = SIZE * SIZE
    rm = np.full(8, -1, np.int32)
    rm[[0, 2, 4, 6]] = nnp     # white's last four: passes
    rm[[1, 3, 5]] = 20         # black's interleaved board moves
    gs = H.replace_pos(gs, recent_moves=jnp.asarray(rm),
                       to_move=jnp.int32(1))
    roots = jax.tree.map(lambda x: jnp.broadcast_to(x, (1,) + x.shape).copy(),
                         gs)
    res_on = run(neutral_model(), roots,
                 sp=SearchParams(root_noise_enabled=False,
                                 root_prune_useless_moves=True),
                 num_sims=30)
    res_off = run(neutral_model(), roots,
                  sp=SearchParams(root_noise_enabled=False), num_sims=30)
    pol_on = np.asarray(res_on.root_policy_prior[0])
    pol_off = np.asarray(res_off.root_policy_prior[0])
    # the pass-alive eye at loc 0 is prunable when enabled
    assert pol_on[0] < 0 and pol_off[0] >= 0
    # moves outside the safe area stay available
    assert pol_on[3 * SIZE + 3] >= 0
    assert (np.asarray(res_on.root_visits) == 31).all()


def test_root_symmetry_pruning():
    """rootSymmetryPruning (markDuplicateMoveLocs): on the empty board,
    only one representative per dihedral orbit keeps a prior (6 orbits
    on 5x5), and the pruning disables itself on asymmetric positions."""
    roots = make_roots(g=1)
    sp_on = SearchParams(root_noise_enabled=False,
                         root_symmetry_pruning=True)
    res = run(neutral_model(), roots, sp=sp_on, num_sims=20)
    pol = np.asarray(res.root_policy_prior[0])
    board_live = (pol[:SIZE * SIZE] >= 0).sum()
    assert board_live == 6        # D4 orbits of the 5x5 cells
    assert pol[SIZE * SIZE] >= 0  # pass never pruned
    # after one asymmetric move, no pruning applies
    roots2 = make_roots(g=1, moves=(1,))
    res2 = run(neutral_model(), roots2, sp=sp_on, num_sims=20)
    pol2 = np.asarray(res2.root_policy_prior[0])
    assert (pol2[:SIZE * SIZE] >= 0).sum() == SIZE * SIZE - 1
