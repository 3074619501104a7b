"""Pallas kernel parity (interpret mode, small unroll to keep CPU compile
time sane; the device path is exercised by bench.py's checksum)."""

import numpy as np
import jax
import jax.numpy as jnp

from code_robchar_tpu.ops import realform
from code_robchar_tpu.ops.pallas_jacobi import fidelity_herm_pallas


def test_pallas_matches_lanes_interpret(rng):
    n, b = 4, 128
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    sym = (a + np.transpose(a, (0, 2, 1))) / 2
    anti = (a - np.transpose(a, (0, 2, 1))) / 2
    ar = jnp.asarray(np.moveaxis(sym, 0, -1).copy())
    ai = jnp.asarray(np.moveaxis(anti, 0, -1).copy())
    t = jnp.asarray(rng.uniform(1, 5, b).astype(np.float32))
    ref = realform.fidelity_herm_lanes(ar, ai, t, 0, 2, sweeps=6)
    out = fidelity_herm_pallas(ar, ai, t, 0, 2, sweeps=6, tile=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
