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

import jax
import jax.numpy as jnp


def enable_x64() -> None:
    """Switch JAX to 64-bit mode (parity regime)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.read("jax_enable_x64"))


def real_dtype():
    return jnp.float64 if x64_enabled() else jnp.float32


def complex_dtype():
    return jnp.complex128 if x64_enabled() else jnp.complex64
