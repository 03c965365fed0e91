"""Pallas kernel tests (interpret mode on CPU; the TPU path is exercised
by bench/benchmark on real hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from katago_tpu.game import board as B
from katago_tpu.ops.labels_pallas import connected_labels_batch


@pytest.mark.parametrize("size,g", [(5, 3), (9, 8), (19, 9)])
def test_labels_kernel_matches_oracle(size, g):
    rng = np.random.default_rng(size * 100 + g)
    nn = size * size
    vals = rng.integers(0, 3, (g, nn)).astype(np.int32)
    ours = np.asarray(connected_labels_batch(jnp.asarray(vals), size))
    ref = np.stack([np.asarray(B.connected_labels(jnp.asarray(v), size))
                    for v in vals])
    np.testing.assert_array_equal(ours, ref)


def test_labels_kernel_snake_worst_case():
    # a single serpentine chain covering the whole board exercises the
    # log-depth bound at maximum diameter
    size = 9
    nn = size * size
    vals = np.ones((1, nn), np.int32)
    out = np.asarray(connected_labels_batch(jnp.asarray(vals), size))
    assert (out == 0).all()


def test_labels_kernel_empty_and_single():
    size = 9
    nn = size * size
    vals = np.zeros((2, nn), np.int32)
    vals[1, 40] = B.BLACK
    out = np.asarray(connected_labels_batch(jnp.asarray(vals), size))
    assert (out[0] == 0).all()       # one empty region
    assert out[1, 40] == 40          # lone stone labels itself
