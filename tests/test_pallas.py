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


def test_pallas_sym_grad_matches_lanes_interpret(rng):
    """The fused gradient kernel must match the XLA lanes gradient
    (which itself matches the rows path at 1e-10)."""
    from code_robchar_tpu.ops import realform
    from code_robchar_tpu.ops.pallas_jacobi import \
        infidelity_and_gradient_sym_pallas

    n, b = 5, 8
    h0 = np.asarray(rng.normal(size=(n, n)))
    h0 = jnp.asarray((h0 + h0.T) / 2, dtype=jnp.float32)
    xs = jnp.asarray(np.column_stack(
        [rng.uniform(-5, 5, (b, n)), rng.uniform(0.5, 20, b)]
    ).astype(np.float32))
    want_e, want_g = realform.infidelity_and_gradient_sym_lanes(
        h0, xs, 0, 3, sweeps=6)
    got_e, got_g = infidelity_and_gradient_sym_pallas(
        h0, xs, 0, 3, sweeps=6, tile=b, interpret=True)
    np.testing.assert_allclose(np.asarray(got_e), np.asarray(want_e),
                               atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               atol=2e-5, rtol=1e-4)


def test_pallas_sym_amp_matches_lanes_interpret(rng):
    """The RL-rollout amplitude kernel must match the XLA lanes amplitude
    (the real-symmetric training-path physics)."""
    from code_robchar_tpu.ops.pallas_jacobi import transfer_amp_sym_pallas
    n, b = 4, 128
    a = rng.normal(size=(b, n, n)).astype(np.float32)
    sym = (a + np.transpose(a, (0, 2, 1))) / 2
    al = jnp.asarray(np.moveaxis(sym, 0, -1).copy())
    t = jnp.asarray(rng.uniform(1, 5, b).astype(np.float32))
    ref_r, ref_i = realform.transfer_amp_sym_lanes(al, t, 0, 2, sweeps=6)
    got_r, got_i = transfer_amp_sym_pallas(al, t, 0, 2, sweeps=6, tile=128,
                                           interpret=True)
    np.testing.assert_allclose(np.asarray(got_r), np.asarray(ref_r),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_i), np.asarray(ref_i),
                               atol=2e-5)
