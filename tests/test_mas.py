"""MAS tests: our lax.scan DP vs a direct numpy port of the DP spec
(the numba kernel's recurrence, reference core.py:14-46)."""

import numpy as np
import jax.numpy as jnp

from f5e_tts_tpu.ops import mas as fmas
import pytest

pytestmark = pytest.mark.core


def _numpy_maximum_path(value, t_ys, t_xs):
    """Straight-line numpy implementation of the DP spec for testing."""
    value = value.copy().astype(np.float32)
    b, T_y, T_x = value.shape
    paths = np.zeros_like(value, dtype=np.int32)
    max_neg = -1e9
    for i in range(b):
        v = value[i]
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = max_neg if x == y else v[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else max_neg
                else:
                    v_prev = v[y - 1, x - 1]
                v[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, y, index] = 1
            if index != 0 and (index == y or v[y - 1, index] < v[y - 1, index - 1]):
                index -= 1
    return paths


def test_mas_matches_numpy_dp(rng):
    b, T_y, T_x = 3, 17, 9
    value = rng.standard_normal((b, T_y, T_x)).astype(np.float32)
    t_ys = np.array([17, 12, 9], np.int32)
    t_xs = np.array([9, 5, 9], np.int32)  # note: t_x <= t_y required by the band;
    # sample 2 is the equal-lengths edge case (diagonal path)
    ref = _numpy_maximum_path(value, t_ys, t_xs)
    ours = np.asarray(fmas.maximum_path(jnp.asarray(value), jnp.asarray(t_ys), jnp.asarray(t_xs)))
    np.testing.assert_array_equal(ours, ref.astype(np.float32))


def test_mas_path_properties(rng):
    b, T_y, T_x = 2, 25, 7
    value = rng.standard_normal((b, T_y, T_x)).astype(np.float32)
    t_ys = np.array([25, 20], np.int32)
    t_xs = np.array([7, 4], np.int32)
    path = np.asarray(fmas.maximum_path(jnp.asarray(value), jnp.asarray(t_ys), jnp.asarray(t_xs)))
    for i in range(b):
        p = path[i, : t_ys[i], : t_xs[i]]
        # exactly one x per row
        assert (p.sum(axis=1) == 1).all()
        # monotonic non-decreasing
        xs = p.argmax(axis=1)
        assert (np.diff(xs) >= 0).all()
        assert (np.diff(xs) <= 1).all()
        # endpoints
        assert xs[0] == 0 and xs[-1] == t_xs[i] - 1
        # rows beyond t_y are zero
        assert path[i, t_ys[i]:].sum() == 0


def test_neg_cent_grid(rng):
    import math

    te = rng.standard_normal((1, 4, 6)).astype(np.float32)
    pe = rng.standard_normal((1, 5, 6)).astype(np.float32)
    grid = np.asarray(fmas.neg_cent_grid(jnp.asarray(te), jnp.asarray(pe)))
    # manual: N(ppg; text, I) log-likelihood
    ref = np.zeros((1, 5, 4), np.float32)
    for t in range(5):
        for s in range(4):
            diff = pe[0, t] - te[0, s]
            ref[0, t, s] = -0.5 * (diff @ diff) - 0.5 * math.log(2 * math.pi) * 6
    np.testing.assert_allclose(grid, ref, rtol=1e-4, atol=1e-4)
