"""Noise-model contract tests (reference: noise_model.py, qnewton.py:366-423,
RLreinforce...:122-133/344-351)."""

import numpy as np
import jax
import jax.numpy as jnp

from code_robchar_tpu.ops import noise, chain


def test_structured_perturbation_hermitian_complex():
    z = np.asarray(noise.structured_perturbation(jax.random.key(0), 6, 0.05,
                                                 complex_offdiag=True))
    np.testing.assert_allclose(z, z.conj().T, atol=0)
    assert np.abs(z.imag).sum() > 0  # complex variant has imaginary couplings
    # structure: only diag and first off-diagonals populated
    mask = np.eye(6) + np.eye(6, k=1) + np.eye(6, k=-1)
    assert np.all(z[mask == 0] == 0)


def test_structured_perturbation_real_variant():
    z = np.asarray(noise.structured_perturbation(jax.random.key(1), 5, 0.05,
                                                 complex_offdiag=False))
    np.testing.assert_allclose(z, z.T, atol=0)
    assert np.abs(z.imag).sum() == 0


def test_structured_perturbation_scale_and_freshness():
    k1, k2 = jax.random.split(jax.random.key(2))
    z1 = np.asarray(noise.structured_perturbation(k1, 20, 0.05))
    z2 = np.asarray(noise.structured_perturbation(k2, 20, 0.05))
    assert not np.all(z1 == z2)  # "don't fix the perturbation!"
    # empirical std of the diagonal across a big batch ~ scale
    ks = jax.random.split(jax.random.key(3), 2000)
    zs = jax.vmap(lambda k: noise.structured_perturbation(k, 4, 0.07))(ks)
    diags = np.asarray(jnp.diagonal(zs, axis1=-2, axis2=-1).real)
    assert abs(diags.std() - 0.07) < 0.005


def test_structured_perturbation_zero_scale_traced():
    # scale is traceable: zero scale must give the zero matrix inside jit
    f = jax.jit(lambda s: noise.structured_perturbation(
        jax.random.key(0), 5, s))
    assert np.all(np.asarray(f(0.0)) == 0)


def test_directional_perturbation_hermitian_pair():
    hits = set()
    for i in range(64):
        z = np.asarray(noise.directional_perturbation(
            jax.random.key(i), 5, 0.1))
        nz = np.argwhere(z != 0)
        assert len(nz) in (1, 2)
        if len(nz) == 2:
            (a, b), (c, d) = nz
            assert (a, b) == (d, c)
            assert z[a, b] == np.conj(z[c, d])
            hits.add((int(a), int(b)))
    assert len(hits) > 3  # multiple directions get sampled


def test_shot_noise_moments():
    keys = jax.random.split(jax.random.key(0), 4000)
    fid = jnp.asarray(0.8)
    draws = 10
    vals = np.asarray(jax.vmap(
        lambda k: noise.shot_noise_fidelity(k, fid, draws))(keys))
    assert abs(vals.mean() - 0.8) < 0.01
    assert abs(vals.std() - np.sqrt(0.8 * 0.2 / draws)) < 0.01


def test_adaptive_shot_protocol_accounting():
    est, calls = noise.adaptive_shot_fidelity(jax.random.key(0),
                                              jnp.asarray(0.8), 5, 0.05)
    # the protocol must consume extra draws (RLreinforce...:354-366 analogue)
    assert int(calls) > 5
    assert abs(float(est) - 0.8) < 0.2
    # tighter tolerance costs more draws
    _, calls_tight = noise.adaptive_shot_fidelity(jax.random.key(0),
                                                  jnp.asarray(0.8), 5, 0.01)
    assert int(calls_tight) > int(calls)


def test_fixed_hamiltonian_ensemble_shapes_and_hermiticity():
    h0 = chain.xx_hamiltonian(5)
    train, test = noise.fixed_hamiltonian_ensemble(
        jax.random.key(4), h0, 0.05, train_size=7, test_size=11)
    assert train.shape == (7, 5, 5) and test.shape == (11, 5, 5)
    t = np.asarray(train)
    np.testing.assert_allclose(t, np.conj(np.transpose(t, (0, 2, 1))),
                               atol=1e-15)
    assert not np.all(t[0] == t[1])
