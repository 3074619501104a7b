"""Optimizer-zoo behavior tests.

Strategy per SURVEY.md §7.4: sequential optimizers are validated on
*fcall-budget-matched outcome quality* and exact record/accounting
semantics, not per-iteration trajectories.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from code_robchar_tpu.models import LBFGS, Adam, NMPlus, SNOB, MODEL_REGISTRY
from code_robchar_tpu.models.env import Environment


RECORD_KEYS = {"time_to_get_fid", "func_calls", "iterations", "repeats",
               "best_fid", "controller"}


def test_registry_matches_reference():
    assert set(MODEL_REGISTRY) == {"ppo", "lbfgs", "snob", "adam", "nmplus"}


def test_lbfgs_noiseless_threshold_mode():
    opt = LBFGS(4, 0, 2, repeats=256, fid_threshold=0.98, max_time=30,
                testing=True, restart_batch=64)
    fid = opt.run()
    assert fid is not None and fid > 0.98
    assert RECORD_KEYS <= set(opt.record)
    assert opt.record["func_calls"] > 0
    assert len(opt.record["controller"]) == 5
    # controller respects bounds
    c = np.asarray(opt.record["controller"])
    assert np.all(c[:4] >= -10 - 1e-9) and np.all(c[:4] <= 10 + 1e-9)
    assert 0 <= c[4] <= 30


def test_lbfgs_gradient_quality_vs_scipy_budget():
    """Outcome parity: scipy L-BFGS-B's best over 60 restarts on the N=4
    0->2 instance is 0.9978 (the landscape optimum region is ~0.9975-0.998
    with T<=30); the batched kernel must land in the same region."""
    opt = LBFGS(4, 0, 2, repeats=128, fid_threshold=0.995, testing=True,
                restart_batch=128)
    fid = opt.run()
    assert fid > 0.995


def test_lbfgs_landscape_exploration_collects_topc():
    opt = LBFGS(4, 0, 2, repeats=10**9, fid_threshold=0.0, testing=True,
                run_until_told_to_stop=True, run_until_completion_its=20000,
                landscape_exploration=True, save_topc=50,
                records_update_rate=5000, restart_batch=32)
    opt.run()
    assert "controllers" in opt.record
    assert 1 <= len(opt.record["controllers"]) <= 50
    assert opt.record["func_calls"] + 1 >= 20000
    assert len(opt.records) >= 1  # fcall checkpoints captured


def test_lbfgs_ham_noisy_runs():
    opt = LBFGS(4, 0, 2, repeats=64, fid_threshold=0.8, testing=True,
                ham_noisy=True, noise=0.02, restart_batch=32)
    fid = opt.run()
    assert fid is None or 0 <= fid <= 1.0 + 1e-9
    if fid is not None:
        # noisy path: best_fid records the TRUE fidelity (qnewton.py:582-585)
        assert 0 <= opt.record["best_fid"] <= 1 + 1e-9


def test_adam_requires_le_mode():
    with pytest.raises(Exception):
        Adam(4, 0, 2, testing=True)


def test_adam_improves_under_budget():
    opt = Adam(4, 0, 2, repeats=10**9, fid_threshold=0.0, testing=True,
               run_until_told_to_stop=True, run_until_completion_its=4000,
               landscape_exploration=True, save_topc=20, restart_batch=16)
    opt.segment_its = 100
    best = opt.run()
    assert best is not None and best > 0.5  # Adam on exact grad moves
    assert opt.record["func_calls"] + 1 >= 4000


def test_nmplus_threshold_mode():
    opt = NMPlus(4, 0, 2, repeats=512, fid_threshold=0.95, testing=True,
                 restart_batch=128)
    fid = opt.run()
    assert fid is not None and fid > 0.95
    # nfev per restart bounded by the 300-eval budget contract
    assert opt.record["func_calls"] <= 512 * 320


def test_snob_budget_accounting():
    opt = SNOB(4, 0, 2, repeats=32, fid_threshold=0.0, testing=True,
               run_until_told_to_stop=True, run_until_completion_its=9600,
               landscape_exploration=True, save_topc=10, restart_batch=16)
    best = opt.run()
    # flat billing: every restart bills exactly budget=300
    assert opt.record["func_calls"] % 300 == 0
    assert best is not None


def test_fixed_ham_multiplier_accounting():
    opt = SNOB(4, 0, 2, repeats=8, fid_threshold=0.0, testing=True,
               run_until_told_to_stop=True, run_until_completion_its=10**7,
               landscape_exploration=True, save_topc=4,
               use_fixed_ham=True, opt_train_size=10, ham_noisy=True,
               restart_batch=4)
    opt.run()
    # budget * train_size per restart (qnewton.py:862-866)
    assert opt.record["func_calls"] % (300 * 10) == 0


def test_environment_wrapper_golden():
    env = Environment(3, 0, 2, np.zeros(3))
    env.reset()
    env.timestep = 22.035034
    _, fid, _ = env.step(np.diag([-0.20574245, 4.3713235, -0.30473375]))
    assert abs(fid - 0.90) < 5e-3


def test_environment_action_wrap():
    env = Environment(3, 0, 2, np.zeros(3), bmax=20)
    env.reset()
    env.timestep = 1.0
    env.step(np.diag([25.0, 0.1, 0.1]))  # |25| > bmax -> wraps by modulus
    assert np.all(np.abs(env.action) <= 20.0)


def test_environment_perturbation_hermitian():
    env = Environment(6, 0, 3, np.zeros(6))
    z = env.structured_perturabation(env.noise) + np.asarray(env.sys)
    assert np.allclose(z, z.conj().T)
    z2 = env.structured_perturabation(env.noise) + np.asarray(env.sys)
    assert not np.all(z == z2)
