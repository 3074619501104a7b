"""Global numeric configuration.

The reference computes everything in numpy complex128 (qnewton.py:141,
noise_model.py:79).  On TPU, float64 is emulated and the matrices are tiny
(N<=10), so the framework supports two regimes:

- *parity* regime: x64 enabled, complex128 kernels; used by the test-suite
  (CPU backend) to hit the 1e-10 fidelity-parity bar against the reference.
- *throughput* regime: complex64 kernels on TPU; used by the Monte-Carlo
  bench path where statistical (not bitwise) accuracy is required.

Kernels take their dtype from their inputs, so callers pick the regime by
constructing inputs with `real_dtype()` / `complex_dtype()`.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Persistent XLA compilation cache.  Collection/figure pipelines are compile-
# dominated between processes (a zoo batch program costs ~26 s to compile on
# the TPU relay vs ~0.2 s to run); the on-disk cache turns every repeat
# compile across processes into a ~0.1 s deserialize (measured on both the
# TPU relay and CPU backends).  Within a process, programs are additionally
# shared across optimizer instances by models/base._PROGRAM_CACHE.
#
# Opt out with ROBCHAR_NO_COMPILATION_CACHE=1; relocate with
# ROBCHAR_COMPILATION_CACHE=<dir>.
# ---------------------------------------------------------------------------
if not os.environ.get("ROBCHAR_NO_COMPILATION_CACHE"):
    _cache_dir = os.environ.get(
        "ROBCHAR_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "robchar",
                     "jax_cache"))
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # read-only filesystem etc. — cache is best-effort
        pass


def enable_x64() -> None:
    """Switch JAX to 64-bit mode (parity regime)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def real_dtype():
    return jnp.float64 if x64_enabled() else jnp.float32


def complex_dtype():
    return jnp.complex128 if x64_enabled() else jnp.complex64
