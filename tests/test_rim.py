"""RIM / Wasserstein metric oracle suite.

Mirrors the coverage of the reference's 17-test suite
(wd_sortof_fast_implementation.py:182-311): equivalence with
scipy.stats.wasserstein_distance against the delta(x-1) / delta(x-0)
comparison samples, the RIM identities RIM_1 == W1 and
RIM_2 == sqrt(RIM_1^2 + var), and edge cases (all-0, all-1, scalar).
Adds batched-reduction cases the reference cannot express.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.stats import wasserstein_distance

from code_robchar_tpu.metrics import (
    wd_from_ideal, wd_from_ideal_zero, rim_p, compute_dkw_error,
    dkw_ecdf_bounds, quantile_yield, get_cdf, get_supcdf, vn_test,
    metric_registry, get_ranks,
)

FIXED = np.array([0.11080853, 0.19674286, 0.2515852, 0.33965725, 0.39020078,
                  0.56853594, 0.57607307, 0.67321294, 0.8323267, 0.9901584])


def samples(rng):
    return [
        FIXED,
        rng.normal(0.85, 0.02, size=10000).clip(0, 1),
        rng.normal(0.67, 0.02, size=10).clip(0, 1),
        rng.uniform(size=10),
        np.ones(5),
        np.array([1.0, 0.0, 1.0, 1.0, 0.0]),
        np.zeros(5),
    ]


def test_wd_from_ideal_equals_scipy_w1(rng):
    for x in samples(rng):
        ours = float(wd_from_ideal(jnp.asarray(x)))
        ref = wasserstein_distance(x, np.ones_like(x))
        assert abs(ours - ref) < 1e-12
        assert abs(ours - float(rim_p(jnp.asarray(x), 1))) < 1e-12


def test_wd_from_ideal_zero_equals_scipy_w1(rng):
    for x in samples(rng):
        ours = float(wd_from_ideal_zero(jnp.asarray(x)))
        ref = wasserstein_distance(x, np.zeros_like(x))
        assert abs(ours - ref) < 1e-12


def test_rim2_identity(rng):
    for x in samples(rng):
        r1 = float(wd_from_ideal(jnp.asarray(x)))
        r2 = float(rim_p(jnp.asarray(x), 2))
        assert abs(np.sqrt(r1 * r1 + x.var()) - r2) < 1e-10


def test_rim_p_order_zero_is_one():
    assert float(rim_p(jnp.asarray(FIXED), 0)) == 1.0


def test_scalar_inputs():
    x = 0.76
    assert abs(float(wd_from_ideal(x)) -
               wasserstein_distance([x], [1.0])) < 1e-12
    assert abs(float(wd_from_ideal_zero(x)) -
               wasserstein_distance([x], [0.0])) < 1e-12


def test_wd_does_not_mutate_input():
    # deliberate divergence from the reference (SURVEY.md quirk 5)
    x = np.array([0.9, 0.1, 0.5])
    _ = wd_from_ideal(jnp.asarray(x))
    np.testing.assert_array_equal(x, [0.9, 0.1, 0.5])


def test_batched_reduction_matches_per_row(rng):
    x = rng.uniform(size=(11, 100, 32))  # (noise, controller, bootrep)
    batched = np.asarray(wd_from_ideal(jnp.asarray(x)))
    assert batched.shape == (11, 100)
    for i in (0, 5, 10):
        for j in (0, 50, 99):
            assert abs(batched[i, j] -
                       wasserstein_distance(x[i, j],
                                            np.ones(32))) < 1e-12


def test_dkw_error_formula():
    assert abs(float(compute_dkw_error(0.05, 100)) -
               np.sqrt(np.log(2 / 0.05) / 200)) < 1e-15


def test_dkw_bounds_clip(rng):
    cdf = np.linspace(0, 1, 50)
    lo, hi = dkw_ecdf_bounds(jnp.asarray(cdf), 0.95)
    eps = float(compute_dkw_error(0.05, 50))
    np.testing.assert_allclose(np.asarray(lo),
                               np.clip(cdf - eps, 0, 1), atol=1e-12)
    np.testing.assert_allclose(np.asarray(hi),
                               np.clip(cdf + eps, 0, 1), atol=1e-12)


def test_quantile_yield():
    x = np.array([0.1, 0.96, 0.99, 0.5])
    assert float(quantile_yield(jnp.asarray(x), 0.95)) == 0.5
    assert float(quantile_yield(jnp.asarray(x), 0.98)) == 0.25


def test_metric_registry_keys_match_reference_schema():
    assert set(metric_registry) == {r"$W(.,\delta(x-1))$", "Q th. 0.95",
                                    "Q th. 0.98", "std", "worst case fid"}


def test_metric_registry_values(rng):
    x = rng.uniform(size=(7, 64))
    xs = jnp.asarray(x)
    assert np.allclose(np.asarray(metric_registry["std"](xs)),
                       x.std(axis=-1))
    assert np.allclose(np.asarray(metric_registry["worst case fid"](xs)),
                       -x.min(axis=-1))
    assert np.allclose(np.asarray(metric_registry["Q th. 0.95"](xs)),
                       -(x >= 0.95).mean(axis=-1))


def test_get_cdf_is_sum_normalised(rng):
    x = rng.uniform(size=20)
    cdf, srt = get_cdf(x)
    assert abs(cdf[-1] - 1) < 1e-12
    np.testing.assert_allclose(cdf, np.sort(x).cumsum() / x.sum())


def test_get_supcdf_matches_naive(rng):
    cdf = np.sort(rng.uniform(size=15))
    sup = get_supcdf(cdf)
    naive = np.array([cdf[i:].sum() / (len(cdf) - i) for i in range(len(cdf))])
    np.testing.assert_allclose(sup, naive, atol=1e-12)


def test_vn_test_random_vs_monotone(rng):
    assert vn_test(rng.normal(0, 1, 50000))[0] is True
    assert vn_test(np.arange(1000, dtype=float))[0] is False
    with pytest.raises(ValueError):
        vn_test(np.arange(10, dtype=float))


def test_get_ranks():
    r = get_ranks(np.array([0.3, 0.1, 0.2]))
    np.testing.assert_array_equal(r, [2, 0, 1])
