"""Profile the per-sim cost components of the 19x19 b18c384 search on TPU.

Times each piece of one playout step at the bench config (G games,
19x19, b18c384nbt bf16) so optimization targets the real bottleneck:

  nn_forward      the batched model forward alone
  featurize       full V7 featurization, chase ladders (3 boards/eval)
  featurize_nolad V7 featurization with ladder planes off
  ladder_chase    one ladder_map_chase solve per game
  benson_pair     calculate_area + calculate_independent_life_area
  final_score     H.final_score_area_pos (terminal eval path, x2 per sim)
  step_pos        one board step
  select_path     PUCT descent on a 600-node pool
  legal_moves     full legality incl. superko scan

Usage:  python tools/profile_search.py [--games 128] [--reps 5]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def drain():
    """Flush the device transfer queue: pending tiny host->device
    transfers (e.g. freshly built SearchParamsArr scalars) otherwise
    contend with the timed region over the tunnel and poison numbers."""
    dummy = jax.device_put(np.zeros((1,), np.float32))
    jax.block_until_ready(dummy)
    time.sleep(0.1)


def timeit(name, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    drain()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps * 1000.0
    print(f"{name:18s} {dt:9.2f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--games", type=int, default=128)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--size", type=int, default=19)
    ap.add_argument("--net", type=str, default="b18c384nbt")
    ap.add_argument("--moves", type=int, default=120)
    ap.add_argument("--skip-nn", action="store_true")
    ap.add_argument("--chunk-ladders", action="store_true")
    ap.add_argument("--skip-parts", action="store_true")
    args = ap.parse_args()

    from katago_tpu.game import history as H
    from katago_tpu.game import rules as R
    from katago_tpu.game import benson
    from katago_tpu.game import ladder as LAD
    from katago_tpu.models import config as MC
    from katago_tpu.models import features as F
    from katago_tpu.models.model import KataGoModel
    from katago_tpu.parallel.mesh import setup_accelerator_dispatch
    from katago_tpu.search import mcts
    from katago_tpu.search.params import SearchParams

    accel = setup_accelerator_dispatch()
    size, g = args.size, args.games
    nn = size * size

    gs = H.new_game(size, H.RulesArr.from_rules(R.Rules.tromp_taylorish()),
                    max_hist=160)
    roots = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (g,) + x.shape).copy(), gs)

    # make realistic midgame boards: play random legal moves
    @jax.jit
    def play_random(roots, rng):
        def body(carry, _):
            gs_b, rng = carry
            rng, k = jax.random.split(rng)

            def one(gs1, key):
                legal = H.legal_moves(gs1, size)
                legal = legal.at[nn].set(False)  # no passes
                logits = jnp.where(legal, 0.0, -1e30)
                mv = jax.random.categorical(key, logits)
                gs2, _ = H.step(gs1, mv.astype(jnp.int32), size)
                return gs2

            keys = jax.random.split(k, g)
            gs_b = jax.vmap(one)(gs_b, keys)
            return (gs_b, rng), None

        (gs_b, _), _ = jax.lax.scan(body, (roots, rng), None,
                                    length=args.moves)
        return gs_b

    roots = jax.device_put(roots, accel)
    t0 = time.time()
    roots = play_random(roots, jax.device_put(jax.random.PRNGKey(0), accel))
    jax.block_until_ready(roots)
    print(f"setup: {args.moves} random moves in {time.time()-t0:.1f}s; "
          f"stones/board ~ "
          f"{float(jnp.mean(jnp.sum((roots.pos.board.stones > 0), 1))):.0f}")

    sp = SearchParams.for_selfplay().to_arr()
    fp = F.FeatureParams.default()

    # --- components -----------------------------------------------------
    reps = args.reps
    if args.skip_parts:
        _profile_chunks(args, roots, accel, sp, size, nn, reps)
        return

    legal_fn = jax.jit(jax.vmap(lambda s: H.legal_moves(s, size)))
    timeit("legal_moves", legal_fn, roots, reps=reps)

    def feat(gs_b, with_lad, mode):
        legal = jax.vmap(lambda s: H.legal_moves(s, size))(gs_b)
        return jax.vmap(
            lambda s, l: F.fill_features(s, size, fp, l, version=7,
                                         with_ladders=with_lad,
                                         ladder_mode=mode))(gs_b, legal)

    timeit("featurize_nolad",
           jax.jit(lambda r: feat(r, False, "chase")), roots, reps=reps)
    timeit("featurize", jax.jit(lambda r: feat(r, True, "chase")), roots,
           reps=reps)

    chase_fn = jax.jit(jax.vmap(
        lambda s, k: LAD.ladder_map_chase(s, size, ko_loc=k)))
    timeit("ladder_chase_x1", chase_fn, roots.pos.board.stones,
           roots.pos.board.ko_loc, reps=reps)

    def benson_pair(st, msl):
        a1 = benson.calculate_area(st, size, jnp.bool_(True), jnp.bool_(True),
                                   jnp.bool_(True), msl)
        a2, _ = benson.calculate_independent_life_area(
            st, size, keep_territories=jnp.bool_(False),
            keep_stones=jnp.bool_(False), suicide_legal=msl)
        return a1, a2

    timeit("benson_pair", jax.jit(jax.vmap(benson_pair)),
           roots.pos.board.stones, roots.rules.multi_suicide, reps=reps)

    fs_fn = jax.jit(jax.vmap(
        lambda p, r: H.final_score_area_pos(p, r, size)))
    timeit("final_score", fs_fn, roots.pos, roots.rules, reps=reps)

    step_fn = jax.jit(jax.vmap(
        lambda p, r, mv: H.step_pos(p, r, mv, size)))
    mv = jnp.full((g,), nn, jnp.int32)
    timeit("step_pos", step_fn, roots.pos, roots.rules, mv, reps=reps)

    if not args.skip_nn:
        cfg = MC.get_config(args.net)
        model = KataGoModel(cfg, pos_len=size, dtype=jnp.bfloat16)
        spat = jnp.zeros((g, size, size, 22), jnp.float32)
        glob = jnp.zeros((g, 19), jnp.float32)
        params = model.init(jax.random.PRNGKey(0), spat, glob)
        params = jax.device_put(params, accel)
        spat = jax.device_put(spat, accel)
        glob = jax.device_put(glob, accel)
        fwd = jax.jit(model.apply)
        t0 = time.time()
        out = fwd(params, spat, glob)
        jax.block_until_ready(out)
        print(f"  (nn compile {time.time()-t0:.0f}s)")
        timeit("nn_forward", fwd, params, spat, glob, reps=reps)

    _profile_chunks(args, roots, accel, sp, size, nn, reps)


def _profile_chunks(args, roots, accel, sp, size, nn, reps):
    from katago_tpu.search import mcts

    # select_path on an initialized tree with some visits: use a stub net
    # so init compiles fast; the tree shape is what matters
    def stub_apply(params_, sp_feat, gl_feat, metadata=None):
        b = sp_feat.shape[0]
        # depend on the inputs so XLA cannot dead-code the featurizer
        eps = (jnp.mean(sp_feat, axis=(1, 2, 3)) * 1e-7
               + jnp.mean(gl_feat, axis=1) * 1e-7)[:, None]
        return {
            "policy_logits": jnp.zeros((b, 2, nn + 1), jnp.float32)
                + eps[:, :, None],
            "value_logits": jnp.zeros((b, 3), jnp.float32) + eps,
            "miscvalue": jnp.zeros((b, 10), jnp.float32) + eps,
            "moremiscvalue": jnp.zeros((b, 8), jnp.float32) + eps,
            "ownership_pretanh": jnp.zeros((b, size, size, 1), jnp.float32)
                + eps[:, :, None, None],
        }

    init_fn = jax.jit(lambda r, k: mcts.init_search(
        stub_apply, None, r, sp, k, size=size, max_nodes=603,
        with_ladders=False))
    ss = init_fn(roots, jax.device_put(jax.random.PRNGKey(1), accel))
    jax.block_until_ready(ss)
    ss2 = ss
    for lad in ([False, True] if args.chunk_ladders else [False]):
        run_fn = jax.jit(lambda s, k: mcts.run_playouts(
            stub_apply, None, s, sp, k, size=size, num_sims=8,
            with_ladders=lad, ladder_mode="chase"))
        t0 = time.time()
        ss2 = run_fn(ss, jax.device_put(jax.random.PRNGKey(2), accel))
        jax.block_until_ready(ss2)
        print(f"  (stub chunk compile ladders={lad} {time.time()-t0:.0f}s)")
        dt = timeit(f"stub_sims_x8_lad{int(lad)}", run_fn, ss2,
                    jax.device_put(jax.random.PRNGKey(3), accel),
                    reps=max(1, reps // 2))
        print(f"  -> per-sim search overhead (no NN, ladders={lad}): "
              f"{dt/8:.2f} ms")

    sel_fn = jax.jit(jax.vmap(
        lambda s: mcts.select_path(s, sp, 64), in_axes=(0,)))
    timeit("select_path", sel_fn, ss2, reps=reps)


if __name__ == "__main__":
    main()
