"""Microbenchmark serialized-gather suspects at search shapes on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/reps*1000:8.2f} ms")


def main():
    from katago_tpu.parallel.mesh import setup_accelerator_dispatch
    from katago_tpu.utils.segment_ops import segment_xor

    accel = setup_accelerator_dispatch()
    g, nn, n, a, h, d = 128, 361, 603, 362, 160, 64
    key = jax.random.PRNGKey(0)
    u32 = lambda *s: jax.device_put(jax.random.randint(
        key, s, 0, 2**30, jnp.int32).astype(jnp.uint32), accel)
    i32 = lambda lo, hi, *s: jax.device_put(jax.random.randint(
        key, s, lo, hi, jnp.int32), accel)
    f32 = lambda *s: jax.device_put(jax.random.normal(key, s), accel)

    keys_gnn2 = u32(g, nn, 2)
    labels = i32(0, nn, g, nn)
    timeit("segment_xor(sort)", jax.jit(jax.vmap(
        lambda v, l: segment_xor(v, l, nn))), keys_gnn2, labels)

    # xor_adjacent_chains core: [4, NN] point-gather from [NN+1, 2] table
    table = u32(g, nn + 1, 2)
    cand = i32(0, nn + 1, g, 4, nn)
    timeit("u32 table gather [4,NN]", jax.jit(jax.vmap(
        lambda t, c: t[c])), table, cand)

    # path-hash gather + hist scatter (make_leaf_gamestate)
    ko_hash = u32(g, n, 2)
    path = i32(0, n, g, d)
    timeit("path row gather [D]", jax.jit(jax.vmap(
        lambda t, p: t[p])), ko_hash, path)
    hist = u32(g, h, 2)
    wr = i32(0, h, g, d)
    vals = u32(g, d, 2)
    timeit("hist scatter [D]", jax.jit(jax.vmap(
        lambda hi, w, v: hi.at[w].set(v))), hist, wr, vals)

    # visits scatter-add [D+1]
    visits = jax.device_put(jnp.zeros((g, n), jnp.int32), accel)
    upd = i32(0, n, g, d + 1)
    ones = jax.device_put(jnp.ones((g, d + 1), jnp.int32), accel)
    timeit("visits scatter-add", jax.jit(jax.vmap(
        lambda vi, u, o: vi.at[u].add(o))), visits, upd, ones)

    # select-style stats gather [A, 18]
    stats = f32(g, n, 18)
    cidx = i32(0, n, g, a)
    timeit("stats row gather [A,18]", jax.jit(jax.vmap(
        lambda s, c: s[c])), stats, cidx)

    # children row gather [A] at one dynamic node (per select iter)
    children = i32(0, n, g, n, a)
    node = i32(0, n, g)
    timeit("children[node] row", jax.jit(jax.vmap(
        lambda ch, nd: ch[nd])), children, node)

    # single-row pool scatter (insert set_at)
    timeit("single-row set", jax.jit(jax.vmap(
        lambda s, nd, v: s.at[nd].set(v))), stats, node, f32(g, 18))

    # 2-d single-element scatter (children link)
    timeit("children[i,j] set", jax.jit(jax.vmap(
        lambda ch, nd, aa: ch.at[nd, aa].set(5))), children, node,
        i32(0, a, g))

    # laddered mask row gather (new code)
    lad = jax.device_put(jnp.zeros((g, n, nn), bool), accel)
    timeit("laddered[node] row", jax.jit(jax.vmap(
        lambda l, nd: l[nd])), lad, node)


if __name__ == "__main__":
    main()
