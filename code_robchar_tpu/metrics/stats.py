"""Statistical test kit and the metric registry.

Covers mcsim.py:34-183 — CDF helpers, the Von-Neumann/Bartels randomness
test, the quantile-yield metric Q(F, th), and the registry of the five
MC-characterisation metrics.  Metrics are batched trailing-axis reductions
(see metrics/rim.py); the registry maps the reference's display names (used
as JSON keys in the .mcm cache format) to those reductions so the cache
files stay interchangeable with the reference's.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np
import jax.numpy as jnp

from code_robchar_tpu.metrics.rim import wd_from_ideal


def get_cdf(arr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Sum-normalised cumulative distribution (mcsim.py:42-47).

    Note this normalises by the *sum* (so it is a Lorenz-style curve, not an
    ECDF) — faithfully mirrored because figure code depends on it.
    Returns (cdf, sorted_values).
    """
    s = np.sort(np.asarray(arr))
    return s.cumsum() / s.sum(), s


def get_supcdf(cdf: np.ndarray) -> np.ndarray:
    """Suffix-mean transform of a cdf vector (mcsim.py:50-57)."""
    cdf = np.asarray(cdf)
    n = len(cdf)
    # supq_i = mean(cdf[i:]): suffix sums via reversed cumsum.
    suffix = np.cumsum(cdf[::-1])[::-1]
    return suffix / (n - np.arange(n))


def vn_test(obs: np.ndarray, alpha: float = 0.95, bartels: bool = True,
            verbose: bool = False) -> Tuple[bool, float]:
    """Von Neumann successive-difference randomness test (mcsim.py:59-123).

    ``bartels=True`` uses the reference's rank-free variant with the
    grid-searched acceptance threshold 1.1 on the raw VN ratio; otherwise a
    Gaussian-approximation p-value interval.  Host-side (analysis path).
    """
    obs = np.asarray(obs, dtype=float)
    n = obs.size
    if n < 40:
        raise ValueError(f"{n} observations are insufficient for the test")
    sdiff = np.diff(obs)
    vn = float(np.mean(sdiff * sdiff) / obs.var())
    if bartels:
        if verbose:
            print(vn)
        return vn > 1.1, vn
    from scipy.stats import norm
    mean = 2.0 * n / (n - 1)
    sigma = 4.0 * n * n * (n - 2) / ((n + 1) * (n - 1) ** 3)
    phi = float(norm.ppf(1 - alpha, loc=mean, scale=np.sqrt(sigma)))
    if verbose:
        print("sigma", sigma, "mean", mean, "VN", vn, "thresh", phi)
    return vn > phi, phi


def quantile_yield(fids: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """Q(F, th) = fraction of samples with fidelity >= th (mcsim.py:144-146),
    batched over leading axes."""
    fids = jnp.atleast_1d(jnp.asarray(fids))
    return jnp.mean((fids >= threshold).astype(fids.dtype), axis=-1)


def _neg_q(th: float) -> Callable[[jnp.ndarray], jnp.ndarray]:
    def metric(fids: jnp.ndarray) -> jnp.ndarray:
        return -quantile_yield(fids, th)
    return metric


def _std(fids: jnp.ndarray) -> jnp.ndarray:
    return jnp.std(jnp.atleast_1d(jnp.asarray(fids)), axis=-1)


def _worst_case(fids: jnp.ndarray) -> jnp.ndarray:
    return -jnp.min(jnp.atleast_1d(jnp.asarray(fids)), axis=-1)


#: The five MC metrics keyed by the reference's display names, which are the
#: literal JSON keys of the .mcm cache schema (mcsim.py:178-183).  All are
#: "smaller is better" (Q and worst-case are negated, mcsim.py:148-157).
metric_registry: Dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    r"$W(.,\delta(x-1))$": wd_from_ideal,
    "Q th. 0.95": _neg_q(0.95),
    "Q th. 0.98": _neg_q(0.98),
    "std": _std,
    "worst case fid": _worst_case,
}


def get_ranks(array: np.ndarray) -> np.ndarray:
    """Dense ranks, 0 = smallest (mcsim.py:513-518)."""
    array = np.asarray(array)
    argranks = np.argsort(array)
    ranks = np.zeros_like(argranks)
    ranks[argranks] = np.arange(len(argranks))
    return ranks


def clustered_ranks(values: np.ndarray, radius_frac: float) -> np.ndarray:
    """'Little-r' clustered rank assignment
    (generate_fig4_kendallrankanalysis.py:146-164): values within
    ``radius_frac * (max - min)`` of the current cluster seed share a rank.
    """
    values = np.asarray(values, dtype=float)
    order = np.argsort(values)
    srt = values[order]
    radius = radius_frac * (srt[-1] - srt[0]) if len(srt) > 1 else 0.0
    ranks_sorted = np.zeros(len(srt), dtype=int)
    rank = 0
    seed = srt[0] if len(srt) else 0.0
    for i in range(1, len(srt)):
        if srt[i] - seed > radius:
            rank += 1
            seed = srt[i]
        ranks_sorted[i] = rank
    ranks = np.zeros(len(srt), dtype=int)
    ranks[order] = ranks_sorted
    return ranks
