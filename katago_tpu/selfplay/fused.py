"""Fused on-device actor-learner — the BASELINE.json north-star loop.

The reference splits selfplay and training into separate processes
coupled through npz files on disk (cpp/command/selfplay.cpp writing,
python/train.py reading). The TPU-native end of that spectrum fuses both
into device programs sharing a DEVICE-RESIDENT replay ring:

  * `actor_chunk` advances every game by `moves_per_chunk` moves inside
    ONE jitted program — search (the full array-MCTS), move selection,
    board stepping, featurization, and replay-row writes are all device
    ops, with NO host round-trip per move (the host loop of
    selfplay/loop.py exists for the full-fidelity npz pipeline; this
    path exists for throughput).
  * `learner_step` samples a batch from the ring and applies one
    gradient step.
  * `fused_step` runs both back to back; under a `jax.sharding.Mesh`
    the game axis and the replay ring shard across devices while
    parameters replicate, so the gradient psum is the only cross-device
    collective per step (the DDP layout; an all-to-all exchanging replay
    shards between actor and learner meshes is the disaggregated
    alternative and composes with the same ring).

Targets on this path are the on-device ones, all already computed by the
batched search: visit-count policy distributions, the search root's
value / score / lead / score-stdev as TD(0)-style bootstraps, and the
tree-averaged root ownership. Loss forms and scales mirror the
file-based trainer's (train/losses.py: value CE 1.20, ownership BCE
1.5, scoremean/lead/scorestdev hubers at 0.0015/0.0060/0.001). What
this path still trades away vs dataio/trainingwrite.py: final-outcome
value mixing, the full score-belief CDF/PDF histograms, seki/futurepos
targets, and multi-horizon TD values — the file-based pipeline
(selfplay/loop.py + train/) remains the full-fidelity reference-parity
path, while this loop removes every host round-trip.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from katago_tpu.game import history as H
from katago_tpu.game import rules as R
from katago_tpu.models import features as F
from katago_tpu.search import mcts
from katago_tpu.search.params import SearchParams


class ReplayRing(NamedTuple):
    """Device-resident training-row ring buffer (per shard when the game
    axis is sharded: rows a shard's actors write are the rows its
    learner slice samples, so filling needs no communication)."""
    spatial: jax.Array       # f32[CAP, NN, C_SP]
    glob: jax.Array          # f32[CAP, C_GL]
    policy: jax.Array        # f32[CAP, A] visit-count distribution
    value: jax.Array         # f32[CAP, 3] win/loss/noresult (mover persp)
    score: jax.Array         # f32[CAP] MOVER-persp score-mean bootstrap
    lead: jax.Array          # f32[CAP] mover-persp lead bootstrap
    score_stdev: jax.Array   # f32[CAP] subtree score stdev
    ownership: jax.Array     # f32[CAP, NN] mover-persp tree-avg ownership
    cursor: jax.Array        # i32 next write slot
    filled: jax.Array        # i32 rows ever written (saturates at CAP)

    @staticmethod
    def create(capacity: int, size: int) -> "ReplayRing":
        nn = size * size
        return ReplayRing(
            spatial=jnp.zeros((capacity, nn, F.NUM_SPATIAL_V7), jnp.float32),
            glob=jnp.zeros((capacity, F.NUM_GLOBAL_V7), jnp.float32),
            policy=jnp.zeros((capacity, nn + 1), jnp.float32),
            value=jnp.zeros((capacity, 3), jnp.float32),
            score=jnp.zeros((capacity,), jnp.float32),
            lead=jnp.zeros((capacity,), jnp.float32),
            score_stdev=jnp.zeros((capacity,), jnp.float32),
            ownership=jnp.zeros((capacity, nn), jnp.float32),
            cursor=jnp.int32(0),
            filled=jnp.int32(0),
        )


def make_actor_chunk(model_apply: Callable, *, size: int, visits: int,
                     max_nodes: int | None = None,
                     search_params: SearchParams | None = None,
                     moves_per_chunk: int = 8) -> Callable:
    """Build actor_chunk(params, games, replay, rng) -> (games, replay).

    Finished games restart from the empty position inside the chunk, so
    the actor runs forever without host intervention."""
    nn = size * size
    sp = (search_params or SearchParams.for_selfplay()).to_arr()
    max_nodes = max_nodes or (2 * visits + 8)
    feat_params = F.FeatureParams.default()

    def one_move(params):
      def move(carry, _):
        games, replay, rng = carry
        g = games.hist_len.shape[0]
        rng, r_search, r_choose = jax.random.split(rng, 3)
        res = mcts.run_search(
            model_apply, params, games, sp, r_search, size=size,
            num_sims=visits, max_nodes=max_nodes, with_ladders=True,
            ladder_mode="chase", max_visits=visits + 1,
            active_mask=~games.pos.game_over)
        move_nums = games.pos.move_num
        moves = mcts.choose_moves(res, sp, move_nums, r_choose)

        # training row of the PRE-move position: visit-count policy and
        # the search root's value/score bootstraps
        legal = jax.vmap(H.legal_moves, in_axes=(0, None))(games, size)
        sp_feat, gl_feat = jax.vmap(
            lambda gs_, l_: F.fill_features_v7(gs_, size, feat_params, l_,
                                               with_ladders=True,
                                               ladder_mode="chase")
        )(games, legal)
        cv = res.child_visits.astype(jnp.float32)          # [G, A]
        pol_t = cv / jnp.maximum(jnp.sum(cv, axis=1, keepdims=True), 1.0)
        wl_white = res.root_winloss                        # [G]
        is_white = games.pos.to_move == 2
        flip = jnp.where(is_white, 1.0, -1.0)
        wl_mover = flip * wl_white
        p_win = jnp.clip(0.5 * (1.0 + wl_mover), 0.0, 1.0)
        val_t = jnp.stack([p_win, 1.0 - p_win, jnp.zeros_like(p_win)],
                          axis=1)
        # mover-perspective regression targets (the net's heads predict
        # from the mover's view; root_* results are white-persp)
        score_t = flip * res.root_score_mean
        lead_t = flip * res.root_lead
        own_t = flip[:, None] * res.root_ownership
        cap = replay.spatial.shape[0]
        live = ~games.pos.game_over
        # compact live games onto consecutive ring slots (dead games must
        # not leave gaps the cursor would re-cover next move)
        off = jnp.cumsum(live.astype(jnp.int32)) - 1
        rows = (replay.cursor + off) % cap
        safe_rows = jnp.where(live, rows, cap)             # cap = pad slot

        def ring_write(store, vals):
            padded = jnp.concatenate(
                [store, jnp.zeros((1,) + store.shape[1:], store.dtype)])
            return padded.at[safe_rows].set(vals.astype(store.dtype))[:cap]

        replay = replay._replace(
            spatial=ring_write(replay.spatial, sp_feat),
            glob=ring_write(replay.glob, gl_feat),
            policy=ring_write(replay.policy, pol_t),
            value=ring_write(replay.value, val_t),
            score=ring_write(replay.score, score_t),
            lead=ring_write(replay.lead, lead_t),
            score_stdev=ring_write(replay.score_stdev,
                                   res.root_score_stdev),
            ownership=ring_write(replay.ownership, own_t),
            cursor=(replay.cursor
                    + jnp.sum(live.astype(jnp.int32))) % cap,
            filled=jnp.minimum(
                replay.filled + jnp.sum(live.astype(jnp.int32)),
                cap),
        )

        games = jax.vmap(
            lambda gs_, mv: H.step(gs_, mv, size)[0])(games, moves)
        # restart finished games from the empty position (fresh rules rows
        # carried over) so the actor stream never drains
        fresh1 = H.new_game(size, jax.tree.map(lambda x: x[0], games.rules),
                            max_hist=games.ko_hash_hist.shape[1])
        fresh = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (g,) + x.shape), fresh1)
        fresh = fresh._replace(rules=games.rules)
        over = games.pos.game_over

        def pick(f, c):
            sh = (-1,) + (1,) * (c.ndim - 1)
            return jnp.where(over.reshape(sh), f, c)

        games = jax.tree.map(pick, fresh, games)
        return (games, replay, rng), None
      return move

    def actor_chunk(params, games, replay, rng):
        (games, replay, rng), _ = jax.lax.scan(
            one_move(params), (games, replay, rng), None,
            length=moves_per_chunk)
        return games, replay

    return actor_chunk


def make_learner_step(model_apply: Callable, optimizer,
                      batch_size: int) -> Callable:
    """learner_step(params, opt_state, replay, rng) ->
    (params, opt_state, metrics). Samples uniformly from the filled part
    of the ring; under a sharded ring each shard samples its own rows and
    the gradient psum (inserted by XLA from the replicated-params /
    sharded-batch layout) is the only collective."""

    def huber(x, t, d):
        e = x - t
        a = jnp.abs(e)
        return jnp.where(a <= d, 0.5 * e * e, d * (a - 0.5 * d))

    def loss_fn(params, batch):
        size = int(batch["spatial"].shape[1] ** 0.5)
        nn = size * size
        out = model_apply(params, batch["spatial"].reshape(
            batch["spatial"].shape[0], size, size, -1), batch["glob"])
        # loss forms/scales mirror train/losses.py (metrics_pytorch):
        logp = jax.nn.log_softmax(out["policy_logits"][:, 0, :], axis=-1)
        pol_loss = -jnp.mean(jnp.sum(batch["policy"] * logp, axis=-1))
        logv = jax.nn.log_softmax(out["value_logits"], axis=-1)
        val_loss = -jnp.mean(jnp.sum(batch["value"] * logv, axis=-1)) * 1.20
        mv = out["miscvalue"]
        sc_loss = 0.0015 * jnp.mean(
            huber(mv[:, 0] * 20.0, batch["score"], 12.0))
        lead_loss = 0.0060 * jnp.mean(
            huber(mv[:, 2] * 20.0, batch["lead"], 8.0))
        stdev_loss = 0.001 * jnp.mean(
            huber(jax.nn.softplus(mv[:, 1]) * 20.0,
                  batch["score_stdev"], 10.0))
        own_logits = out["ownership_pretanh"].reshape(-1, nn) * 2.0
        own_probs = (1.0 + batch["ownership"]) * 0.5
        own_bce = own_probs * jax.nn.log_sigmoid(own_logits) + \
            (1.0 - own_probs) * jax.nn.log_sigmoid(-own_logits)
        own_loss = 1.5 * jnp.mean(jnp.sum(-own_bce, axis=1) / nn)
        loss = (pol_loss + val_loss + sc_loss + lead_loss + stdev_loss
                + own_loss)
        return loss, {"loss": loss, "policy_loss": pol_loss,
                      "value_loss": val_loss, "score_loss": sc_loss,
                      "lead_loss": lead_loss, "scorestdev_loss": stdev_loss,
                      "ownership_loss": own_loss}

    def learner_step(params, opt_state, replay: ReplayRing, rng):
        hi = jnp.maximum(replay.filled, 1)
        idx = jax.random.randint(rng, (batch_size,), 0,
                                 hi, dtype=jnp.int32)
        batch = {
            "spatial": replay.spatial[idx],
            "glob": replay.glob[idx],
            "policy": replay.policy[idx],
            "value": replay.value[idx],
            "score": replay.score[idx],
            "lead": replay.lead[idx],
            "score_stdev": replay.score_stdev[idx],
            "ownership": replay.ownership[idx],
        }
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return learner_step


def make_fused_step(model_apply: Callable, optimizer, *, size: int,
                    visits: int, batch_size: int,
                    moves_per_chunk: int = 4,
                    search_params: SearchParams | None = None) -> Callable:
    """One jitted fused step: actor chunk, then one learner update from
    the ring. jit it (optionally with mesh in_shardings: game axis and
    ring sharded, params/opt replicated) and iterate from the host —
    each iteration is a single device program."""
    actor = make_actor_chunk(model_apply, size=size, visits=visits,
                             search_params=search_params,
                             moves_per_chunk=moves_per_chunk)
    learner = make_learner_step(model_apply, optimizer, batch_size)

    def fused_step(params, opt_state, games, replay, rng):
        r_actor, r_learn = jax.random.split(rng)
        games, replay = actor(params, games, replay, r_actor)
        params, opt_state, metrics = learner(params, opt_state, replay,
                                             r_learn)
        return params, opt_state, games, replay, metrics

    return fused_step


def new_games(size: int, num_games: int, rules: R.Rules | None = None,
              max_moves: int | None = None,
              komi_stdev: float = 0.0,
              rng: jax.Array | None = None) -> H.GameState:
    """[G]-batch of fresh games for the actor stream.

    komi_stdev > 0 draws each game's komi from a rounded normal around
    the base komi — the fused-path slice of gameinit's komi
    randomization (selfplay/gameinit.py komiStdev, play.cpp); restart
    rows inside actor_chunk keep each game's randomized rules row."""
    rules = rules or R.Rules.tromp_taylorish()
    nn = size * size
    max_hist = (max_moves or int(nn * 1.6) + 20) + 8
    gs = H.new_game(size, H.RulesArr.from_rules(rules), max_hist=max_hist)
    games = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (num_games,) + x.shape).copy(), gs)
    if komi_stdev > 0.0:
        if rng is None:
            rng = jax.random.PRNGKey(0)
        jitter = jax.random.normal(rng, (num_games,)) * komi_stdev
        komi = rules.komi + jnp.round(jitter * 2.0) / 2.0
        games = games._replace(rules=games.rules._replace(komi=komi))
    return games
