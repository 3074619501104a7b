"""Parity tests for the physics core against reference-style scipy numerics.

The oracle is the reference's own formulation re-executed with scipy:
U = scipy.linalg.expm(-1j*T*H) and the augmented-matrix gradient
(qnewton.py:162-212), at 1e-10 tolerance (BASELINE.json parity bar).
"""

import numpy as np
import scipy.linalg
import jax
import jax.numpy as jnp
import pytest

from code_robchar_tpu.ops import chain, propagate
from code_robchar_tpu.ops.eigh import jacobi_eigh


def ref_hamiltonian(n, topo="chain", heisenberg=False):
    hh = np.zeros((n, n), dtype=np.complex128)
    for l in range(1, n):
        hh[l - 1, l] = 1
        hh[l, l - 1] = 1
    if topo == "ring":
        hh[n - 1, 0] = 1
        hh[0, n - 1] = 1
    if heisenberg:
        t = 0.5 * np.triu(hh).sum().real * np.ones(n) - np.sum(hh, axis=1).real
        hh += np.diag(t)
    return hh


def ref_fidelity(n, x, in_spin, out_spin, h0=None):
    """Reference objective (qnewton.py:383-400) via scipy expm."""
    t = abs(x[n])
    h = ref_hamiltonian(n) if h0 is None else h0.copy()
    h = h + np.diag(x[:n])
    u = scipy.linalg.expm(-1j * t * h)
    phi = u[out_spin, in_spin]
    return phi.real * phi.real + phi.imag * phi.imag


def ref_infidelity_and_grad(n, x, in_spin, out_spin):
    """Reference augmented-matrix gradient (qnewton.py:162-212)."""
    t = abs(x[n])
    h = ref_hamiltonian(n) + np.diag(x[:n])
    th = -1j * t * h
    u = scipy.linalg.expm(th)
    nd = n
    a = np.zeros((2 * nd, 2 * nd), dtype=np.complex128)
    a[:nd, :nd] = th
    a[nd:, nd:] = th
    du = []
    for l in range(n):
        cc = np.zeros((n, n))
        cc[l, l] = 1
        a[nd:, :nd] = -1j * t * cc
        psi = scipy.linalg.expm(a)
        du.append(psi[nd:, :nd])
    hu = h @ u
    grad = np.zeros(n + 1)
    phi = u[out_spin, in_spin]
    err = 1 - (phi.real ** 2 + phi.imag ** 2)
    for l in range(n):
        z = du[l][out_spin, in_spin] * phi.conjugate()
        grad[l] -= 2 * z.real
    z = hu[out_spin, in_spin] * phi.conjugate()
    grad[n] -= 2 * z.imag
    return err, grad


@pytest.mark.parametrize("n,topo,heis", [(4, "chain", False),
                                         (5, "ring", False),
                                         (6, "chain", True)])
def test_hamiltonian_matches_reference(n, topo, heis):
    ours = np.asarray(chain.xx_hamiltonian(n, topo=topo, heisenberg=heis))
    theirs = ref_hamiltonian(n, topo=topo, heisenberg=heis)
    np.testing.assert_allclose(ours, theirs, atol=0)


@pytest.mark.parametrize("n,out", [(4, 2), (5, 2), (5, 4), (6, 3), (7, 6)])
def test_fidelity_parity_1e10(n, out, rng):
    h0 = chain.xx_hamiltonian(n)
    for _ in range(10):
        x = np.concatenate([rng.uniform(-10, 10, n), rng.uniform(0, 30, 1)])
        ours = float(propagate.fidelity_from_controller(
            h0, jnp.asarray(x), 0, out))
        theirs = ref_fidelity(n, x, 0, out)
        assert abs(ours - theirs) < 1e-10


def test_propagator_unitary_and_matches_expm(rng):
    n = 6
    h0 = np.asarray(chain.xx_hamiltonian(n)) + np.diag(rng.uniform(-5, 5, n))
    t = 7.3
    u = np.asarray(propagate.propagator(jnp.asarray(h0), t))
    np.testing.assert_allclose(u @ u.conj().T, np.eye(n), atol=1e-12)
    np.testing.assert_allclose(u, scipy.linalg.expm(-1j * t * h0), atol=1e-10)


@pytest.mark.parametrize("n,out", [(4, 2), (5, 2), (7, 6)])
def test_gradient_parity_vs_augmented_expm(n, out, rng):
    h0 = chain.xx_hamiltonian(n)
    for _ in range(5):
        x = np.concatenate([rng.uniform(-10, 10, n), rng.uniform(0.1, 30, 1)])
        err, grad = propagate.infidelity_and_gradient(
            h0, jnp.asarray(x), 0, out)
        rerr, rgrad = ref_infidelity_and_grad(n, x, 0, out)
        assert abs(float(err) - rerr) < 1e-10
        np.testing.assert_allclose(np.asarray(grad), rgrad, atol=1e-9)


def test_gradient_at_degenerate_spectrum():
    # biases tuned so two eigenvalues collide: uniform bias shifts the whole
    # spectrum; a zero-coupling-free case with exact degeneracy is the
    # equal-bias ring (eigenvalues 2cos(2 pi k / n) are doubly degenerate).
    n = 6
    h0 = chain.xx_hamiltonian(n, topo="ring")
    x = jnp.asarray(np.concatenate([np.full(n, 1.7), [5.0]]))
    err, grad = propagate.infidelity_and_gradient(h0, x, 0, 3)
    assert np.isfinite(float(err))
    assert np.all(np.isfinite(np.asarray(grad)))
    # finite-difference cross-check (central, loose tol for FD error)
    fd = np.zeros(n + 1)
    eps = 1e-6
    xv = np.asarray(x)
    for i in range(n + 1):
        xp, xm = xv.copy(), xv.copy()
        xp[i] += eps
        xm[i] -= eps
        fp = 1 - float(propagate.fidelity_from_controller(
            h0, jnp.asarray(xp), 0, 3))
        fm = 1 - float(propagate.fidelity_from_controller(
            h0, jnp.asarray(xm), 0, 3))
        fd[i] = (fp - fm) / (2 * eps)
    np.testing.assert_allclose(np.asarray(grad), fd, atol=1e-5)


def test_overlap_ss_matches_reference(rng):
    n = 5
    x = np.concatenate([rng.uniform(-10, 10, n), [3.0]])
    h = ref_hamiltonian(n) + np.diag(x[:n])
    e, v = np.linalg.eigh(h)
    rho0 = np.zeros((n, n)); rho0[0, 0] = 1
    rho1 = np.zeros((n, n)); rho1[2, 2] = 1
    rho_ss = np.diag(v.conj().T @ rho0 @ v)
    rho_out = v.conj().T @ rho1 @ v
    theirs = np.trace(np.diag(rho_ss) @ rho_out).real
    ours = float(propagate.overlap_ss(
        chain.xx_hamiltonian(n), jnp.asarray(x), 0, 2))
    assert abs(ours - theirs) < 1e-12


def test_env_golden_values():
    """Golden controller values from the reference's Envtest
    (RLreinforceXXchain_actionedtime.py:295-341) — exact oracles for the
    full (H0 + diag(action), T) -> fidelity path."""
    cases = [
        (10, 0, 3,
         [9.76909983, 10.65815206, 10.65467358, 9.71995292, -12.0,
          8.69457352, 12.0, -11.77314325, -11.29782006, 5.27449319],
         25.13468797, 0.995),
        (3, 0, 2, [-0.20574245, 4.3713235, -0.30473375], 22.035034, 0.90),
        (6, 0, 2,
         [2.9160861365962774, 4.385934774763882, 2.9311789427883923,
          9.826275581493974, 9.276727781863883, 5.071161912055686],
         3.6651542489416897, 0.9025),
    ]
    for n, i, o, action, t, expected in cases:
        x = jnp.asarray(np.concatenate([action, [t]]))
        fid = float(propagate.fidelity_from_controller(
            chain.xx_hamiltonian(n), x, i, o))
        assert abs(fid - expected) < 5e-3


def test_batched_fidelity_matches_scalar(rng):
    n, out = 5, 2
    h0 = chain.xx_hamiltonian(n)
    xs = np.column_stack([rng.uniform(-10, 10, (64, n)),
                          rng.uniform(0, 30, 64)])
    batch = np.asarray(propagate.fidelity_batch(h0, jnp.asarray(xs), 0, out))
    for i in range(0, 64, 7):
        assert abs(batch[i] - ref_fidelity(n, xs[i], 0, out)) < 1e-10


def test_jacobi_eigh_matches_lapack(rng):
    for n in (4, 7, 8, 10):
        a = rng.normal(size=(32, n, n)) + 1j * rng.normal(size=(32, n, n))
        h = (a + np.conj(np.transpose(a, (0, 2, 1)))) / 2
        lam, v = jacobi_eigh(jnp.asarray(h))
        lam_ref = np.linalg.eigvalsh(h)
        np.testing.assert_allclose(np.asarray(lam), lam_ref, atol=1e-10)
        # eigenvector property: H v_k = lam_k v_k
        hv = np.einsum("bij,bjk->bik", h, np.asarray(v))
        vl = np.asarray(v) * np.asarray(lam)[:, None, :]
        np.testing.assert_allclose(hv, vl, atol=1e-9)


def test_fidelity_via_jacobi_matches_lapack_path(rng):
    n, out = 7, 3
    h0 = chain.xx_hamiltonian(n)
    x = jnp.asarray(np.concatenate([rng.uniform(-10, 10, n), [12.0]]))
    f_lapack = float(propagate.fidelity_from_controller(h0, x, 0, out))
    f_jacobi = float(propagate.fidelity_from_controller(
        h0, x, 0, out, eigh=jacobi_eigh))
    assert abs(f_lapack - f_jacobi) < 1e-10
