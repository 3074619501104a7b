"""RIM / Wasserstein robustness kernels as batched on-device reductions.

Functional equivalents of wd_sortof_fast_implementation.py:38-174, designed
as *batched last-axis reductions*: every function accepts arrays of shape
(..., B) and reduces the trailing sample axis, so the whole
(noise levels x controllers) metric tensor of the MC engine is one fused
sort+dot on device instead of a Python double loop (mcsim.py:487-498).

Definitions (for a sample of fidelities F in [0, 1]):

- ``wd_from_ideal``  = 1-Wasserstein distance W1(F, delta(x-1)) == RIM_1:
  sort F ascending, intervals = diff(concat(F, [1])), step-cdf k/B,
  answer = intervals . cdf  (wd_sortof...:104-116).  Identically equal to
  mean(1 - F), but computed in the reference's sorted-CDF form, which is the
  form the DKW-shifted variants rely on.
- ``wd_from_ideal_zero`` = W1(F, delta(x-0)) = 1 - wd_from_ideal
  (wd_sortof...:119-142); the ARIM applies this to RIM samples.
- ``rim_p``          = (mean((1-F)^p))^(1/p) (wd_sortof...:147-174).
- ``compute_dkw_error`` / ``dkw_ecdf_bounds``: Dvoretzky-Kiefer-Wolfowitz
  confidence bands (wd_sortof...:38-79).

Unlike the reference's ``wd_from_ideal`` these are pure — the caller's array
is never sorted in place (SURVEY.md §5 quirk 5 is deliberately not carried
over; the 17-test oracle suite in tests/test_rim.py pins value parity).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def wd_from_ideal(fids: jnp.ndarray) -> jnp.ndarray:
    """W1 distance of the trailing-axis sample from delta(x-1) (== RIM_1)."""
    fids = jnp.atleast_1d(jnp.asarray(fids))
    b = fids.shape[-1]
    srt = jnp.sort(fids, axis=-1)
    upper = jnp.concatenate(
        [srt, jnp.ones(srt.shape[:-1] + (1,), srt.dtype)], axis=-1)
    intervals = jnp.diff(upper, axis=-1)
    cdf = jnp.arange(1, b + 1, dtype=srt.dtype) / b
    return jnp.sum(intervals * cdf, axis=-1)


def wd_from_ideal_zero(fids: jnp.ndarray) -> jnp.ndarray:
    """W1 distance of the trailing-axis sample from delta(x-0)."""
    return 1.0 - wd_from_ideal(fids)


def rim_p(fids: jnp.ndarray, p: float = 2) -> jnp.ndarray:
    """p-order robustness infidelity measure; rim_p(F, 1) == wd_from_ideal(F).

    The p == 0 convention returns 1 (wd_sortof...:168-169).
    """
    fids = jnp.atleast_1d(jnp.asarray(fids))
    if p == 0:
        return jnp.ones(fids.shape[:-1], fids.dtype)
    out = jnp.mean(jnp.power(1.0 - fids, p), axis=-1)
    return jnp.power(out, 1.0 / p)


def compute_dkw_error(alpha: float, nobs: int) -> float:
    """DKW band half-width sqrt(log(2/alpha) / (2 n)) (wd_sortof...:38-39)."""
    return jnp.sqrt(jnp.log(2.0 / alpha) / (2.0 * nobs))


def dkw_ecdf_bounds(cdf: jnp.ndarray, conf_level: float
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(lower, upper) DKW confidence band around an ECDF, clipped to [0,1]
    (wd_sortof...:41-79; the band width uses the trailing-axis length)."""
    cdf = jnp.atleast_1d(jnp.asarray(cdf))
    eps = compute_dkw_error(1.0 - conf_level, cdf.shape[-1])
    return jnp.clip(cdf - eps, 0.0, 1.0), jnp.clip(cdf + eps, 0.0, 1.0)
