"""Coverage for the remaining reference behaviors: adaptive-shot optimizer
runs, run_var_spins, the characterise() product API, NMPlus benchmark
objectives."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from code_robchar_tpu.exp import Experiment
from code_robchar_tpu.mc import characterise
from code_robchar_tpu.models import LBFGS, NMPlus
from code_robchar_tpu.ops import chain
from code_robchar_tpu.parallel import make_mesh


def test_characterise_one_call(rng):
    h0 = chain.xx_hamiltonian_real(4)
    ctrl = jnp.asarray(np.column_stack([rng.uniform(-5, 5, (8, 4)),
                                        rng.uniform(1, 10, 8)]))
    out = characterise(h0, ctrl, jnp.asarray([0.0, 0.05]),
                       jax.random.key(0), 6, 0, 2, use_pallas=False)
    assert out["fids"].shape == (2, 8, 6)
    assert out[r"$W(.,\delta(x-1))$"].shape == (2, 8)
    # sharded variant agrees bitwise
    out_sharded = characterise(h0, ctrl, jnp.asarray([0.0, 0.05]),
                               jax.random.key(0), 6, 0, 2,
                               use_pallas=False, mesh=make_mesh(8))
    np.testing.assert_array_equal(np.asarray(out_sharded["fids"]),
                                  np.asarray(out["fids"]))


def test_adaptive_shot_optimizer_accounting():
    """Adaptive protocol bills its draw consumption in-band
    (qnewton.py:565-567)."""
    opt = LBFGS(3, 0, 2, repeats=8, fid_threshold=0.0, testing=True,
                fid_noisy=True, adaptive=True, draws=5, adp_tol=0.2,
                run_until_told_to_stop=True, run_until_completion_its=10**9,
                landscape_exploration=True, save_topc=4, restart_batch=4)
    opt.run()
    # with draws=5 per batch, billed calls are large multiples of draws
    assert opt.record["func_calls"] > 8 * 5


def test_run_var_spins(tmp_path):
    exp = Experiment("pipeline_spins", Nspin=4, inspin=0, outspin=2,
                     fid_threshold=0.3, runs=2, testing=True,
                     noises=np.asarray([0.0]),
                     run_until_told_to_stop=False,
                     global_dir=str(tmp_path / "experiments"))
    exp.run_var_spins(model_choices="nmplus", spins=[3, 4],
                      transitions=[2, 2])
    data = json.load(open(exp.filename))
    assert set(data["nmplus"].keys()) == {"3", "4"}
    for cell in data["nmplus"].values():
        assert len(cell["controller"]) == 2


def test_nmplus_benchmark_objectives():
    opt = NMPlus(4, 0, 2, testing=True)
    assert opt.powell(np.zeros(6)) == 0.0
    assert abs(opt.f([0.0, 0.0, 0.0])) < 1e-12
    simplex = np.eye(5, 5)
    srt, vals = opt.sort_simplex(simplex, obj_f=opt.powell)
    assert vals == sorted(vals)
    g = opt.estimate_hyperplane(srt, vals)
    assert g.shape == (5,)


def test_env_golden_n10():
    """The reference Envtest's N=10 golden case through the stateful env."""
    from code_robchar_tpu.models.env import Environment
    action = np.array([9.76909983, 10.65815206, 10.65467358, 9.71995292,
                       -12.0, 8.69457352, 12.0, -11.77314325, -11.29782006,
                       5.27449319])
    env = Environment(10, 0, 3, np.zeros(10))
    env.reset()
    env.timestep = 25.13468797
    _, fid, _ = env.step(np.diag(action))
    assert abs(fid - 0.995) < 5e-3
