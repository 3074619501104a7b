"""MC engine + MCDataSim cache-layer tests.

Oracles: per-element recomputation with scipy expm (reference-style
noise_model.evaluate_noisy_fidelity), the reference's .mc/.mcm JSON
schemas, and the literal cache-filename convention.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import scipy.linalg

from code_robchar_tpu.mc import (mc_fidelity_sweep, metric_tensors,
                                 arim_from_rims, MCDataSim)
from code_robchar_tpu.mc.engine import bootstrap_statistic_std
from code_robchar_tpu.metrics import wd_from_ideal
from code_robchar_tpu.ops import chain, noise
from code_robchar_tpu.utils import io


def test_sweep_shape_and_zero_noise_determinism(rng):
    n, c, l, b = 4, 6, 3, 5
    h0 = chain.xx_hamiltonian(n)
    xs = jnp.asarray(np.column_stack([rng.uniform(-5, 5, (c, n)),
                                      rng.uniform(1, 10, c)]))
    noises = jnp.asarray([0.0, 0.05, 0.1])
    fids = np.asarray(mc_fidelity_sweep(h0, xs, noises, jax.random.key(0),
                                        b, 0, 2, chunk=16))
    assert fids.shape == (l, c, b)
    assert np.all(fids >= 0) and np.all(fids <= 1)
    # sigma=0: every bootstrap rep sees the unperturbed Hamiltonian
    for ci in range(c):
        assert np.allclose(fids[0, ci], fids[0, ci, 0], atol=1e-12)
    # sigma>0: reps differ
    assert fids[2].std(axis=-1).max() > 1e-4


def test_sweep_element_matches_direct_evaluation(rng):
    """Cross-check one lattice element against a direct recomputation with
    the same key: perturbation + scipy expm fidelity (the reference's
    evaluate_noisy_fidelity formulation, noise_model.py:98-109)."""
    n = 5
    h0 = chain.xx_hamiltonian(n)
    xs = jnp.asarray(np.column_stack([rng.uniform(-5, 5, (3, n)),
                                      rng.uniform(1, 10, 3)]))
    noises = jnp.asarray([0.02, 0.07])
    b = 4
    fids = np.asarray(mc_fidelity_sweep(h0, xs, noises, jax.random.key(7),
                                        b, 0, 2, chunk=8))
    for (l, c, bi) in [(0, 0, 0), (1, 2, 3), (1, 1, 1)]:
        gid = (l * 3 + c) * b + bi
        k = jax.random.fold_in(jax.random.key(7), jnp.uint32(gid))
        z = np.asarray(noise.structured_perturbation(k, n, float(noises[l])))
        x = np.asarray(xs[c])
        h = np.asarray(h0) + z + np.diag(x[:n])
        u = scipy.linalg.expm(-1j * abs(x[n]) * h)
        ref = abs(u[2, 0]) ** 2
        assert abs(fids[l, c, bi] - ref) < 1e-10


def test_metric_tensors_schema_and_values(rng):
    fids = jnp.asarray(rng.uniform(size=(3, 7, 50)))
    md = metric_tensors(fids, alpha=0.05)
    names = {r"$W(.,\delta(x-1))$", "Q th. 0.95", "Q th. 0.98", "std",
             "worst case fid"}
    assert set(md) == {n + s for n in names for s in ("", " upper", " lower")}
    # center RIM equals direct reduction
    np.testing.assert_allclose(np.asarray(md[r"$W(.,\delta(x-1))$"]),
                               np.asarray(wd_from_ideal(fids)), atol=1e-12)
    # band inversion contract: "upper" computed from fids - eps
    eps = float(np.sqrt(np.log(2 / 0.05) / (2 * 50)))
    shifted = jnp.clip(fids - eps, 0, 1)
    np.testing.assert_allclose(
        np.asarray(md[r"$W(.,\delta(x-1))$" + " upper"]),
        np.asarray(wd_from_ideal(shifted)), atol=1e-12)


def test_arim():
    rims = jnp.asarray([0.1, 0.2, 0.3])
    from scipy.stats import wasserstein_distance
    ref = wasserstein_distance(np.asarray(rims), np.zeros(3))
    assert abs(float(arim_from_rims(rims)) - ref) < 1e-12


def test_bootstrap_statistic_std(rng):
    x = jnp.asarray(rng.uniform(size=200))
    s = float(bootstrap_statistic_std(jax.random.key(0), x,
                                      lambda v: jnp.mean(v, axis=-1), 200))
    # bootstrap std of the mean ~ sigma/sqrt(n)
    expected = float(np.std(np.asarray(x)) / np.sqrt(200))
    assert abs(s - expected) < 0.3 * expected + 1e-3


def _write_store(tmp, n=4, c=5, algos=("ppo", "lbfgs"), nspin_key="4"):
    rng = np.random.default_rng(0)
    store = {}
    for algo in algos:
        if algo == "lbfgs":
            store[algo] = {nspin_key: {"controller": rng.uniform(
                -5, 5, (c, n + 1)).tolist()}}
        else:
            store[algo] = {"0.05": {"controller": rng.uniform(
                -5, 5, (c, n + 1)).tolist()}}
    path = os.path.join(tmp, "experiments", "pipeline_test")
    os.makedirs(path, exist_ok=True)
    fname = os.path.join(path, f"ppo_spin_{n}_0-2_c_{c}.le")
    with open(fname, "w") as f:
        json.dump(store, f)
    return fname


def test_mcname_matches_reference_convention(tmp_path):
    _write_store(str(tmp_path))
    sim = MCDataSim("pipeline_test", Nspin=4, inspin=0, outspin=2,
                    noises=np.linspace(0, 0.1, 11), bootreps=1,
                    numcontrollers=5, filemarker=".le",
                    global_experiments_directory=str(
                        tmp_path / "experiments"))
    name = sim.get_mcname("0.05")
    tail = os.path.basename(name)
    # the reference embeds str(np.ndarray) verbatim (mcsim.py:356)
    expected_nlvl = str(np.linspace(0, 0.1, 11))
    assert tail == f"ppo_spin_4_0-2_c_5.le_tn0.05_br_1_nlvl{expected_nlvl}.mc"


def test_datasim_end_to_end_with_cache(tmp_path):
    _write_store(str(tmp_path))
    kw = dict(Nspin=4, inspin=0, outspin=2, noises=np.linspace(0, 0.1, 3),
              bootreps=4, numcontrollers=5, filemarker=".le",
              global_experiments_directory=str(tmp_path / "experiments"))
    sim = MCDataSim("pipeline_test", **kw)
    assert set(sim.algos) == {"ppo", "lbfgs"}

    md = sim.get_metrics_dict("0.05")
    assert set(md) == {"ppo", "lbfgs"}
    tensor = np.asarray(md["ppo"][r"$W(.,\delta(x-1))$"])
    assert tensor.shape == (3, 5)

    # .mc and .mcm files exist and reload identically through the cache path
    assert os.path.exists(sim.get_mcname("0.05"))
    assert os.path.exists(sim.get_mcname("0.05") + "m")
    sim2 = MCDataSim("pipeline_test", **kw)
    md2 = sim2.get_metrics_dict("0.05")
    np.testing.assert_array_equal(
        np.asarray(md2["ppo"][r"$W(.,\delta(x-1))$"]), tensor)

    # fid tensor schema: {algo: [L][C][B]}
    mc = json.load(open(sim.get_mcname("0.05")))
    arr = np.asarray(mc["ppo"])
    assert arr.shape == (3, 5, 4)


def test_datasim_nan_padding(tmp_path):
    _write_store(str(tmp_path), c=5)
    # ask for more controllers than the store holds -> NaN padding
    # (mcsim.py:434-443)
    sim = MCDataSim("pipeline_test", Nspin=4, inspin=0, outspin=2,
                    noises=np.linspace(0, 0.1, 2), bootreps=2,
                    numcontrollers=5, filemarker=".le",
                    global_experiments_directory=str(
                        tmp_path / "experiments"))
    xs = sim._controller_matrix("ppo", "0.05")
    assert xs.shape == (5, 5)
    sim.numcontrollers = 8
    xs = sim._controller_matrix("ppo", "0.05")
    assert np.isnan(xs[5:]).all() and not np.isnan(xs[:5]).any()

    # an EMPTY store cell (nothing passed fid_threshold) parses as a 1-D
    # (0,) array — must yield the all-NaN pad, not a concatenate crash
    sim.controllers["ppo"]["0.05"]["controller"] = []
    xs = sim._controller_matrix("ppo", "0.05")
    assert xs.shape == (8, 5) and np.isnan(xs).all()


def test_best_controller_perf_rank_sum(rng):
    sim = MCDataSim.__new__(MCDataSim)  # no store needed for the static part
    sim.numcontrollers = 10
    metric = rng.uniform(size=(4, 10))
    diff, diff_med, best_c, med_c, best = sim.get_best_controller_perf(metric)
    assert np.all(diff >= -1e-12)
    assert best_c.shape == (4,)
    # the rank-sum winner must be a real column of the tensor
    assert any(np.allclose(best_c, metric[:, j]) for j in range(10))


def test_metric_tensor_bands_match_sorted_oracle(rng):
    """The sortless production metric path must equal the sorted-CDF
    oracle on ALL three DKW bands."""
    fids = jnp.asarray(rng.uniform(size=(2, 5, 40)))
    md = metric_tensors(fids, alpha=0.05)
    eps = float(np.sqrt(np.log(2 / 0.05) / (2 * 40)))
    for suffix, shifted in [("", fids),
                            (" upper", jnp.clip(fids - eps, 0, 1)),
                            (" lower", jnp.clip(fids + eps, 0, 1))]:
        np.testing.assert_allclose(
            np.asarray(md[r"$W(.,\delta(x-1))$" + suffix]),
            np.asarray(wd_from_ideal(shifted)), atol=1e-12)


def test_characterise_cpu_autoselects_xla(rng):
    """use_pallas=None must not pick the Pallas kernel on CPU."""
    from code_robchar_tpu.mc import characterise
    h0 = chain.xx_hamiltonian_real(4)
    ctrl = jnp.asarray(np.column_stack([rng.uniform(-5, 5, (4, 4)),
                                        rng.uniform(1, 5, 4)]))
    out = characterise(h0, ctrl, jnp.asarray([0.05]), jax.random.key(0),
                       3, 0, 2)  # auto
    assert out["fids"].shape == (1, 4, 3)


def test_drivers_usage_exit():
    import subprocess, sys
    r = subprocess.run([sys.executable, "-m",
                        "code_robchar_tpu.exp.drivers"],
                       capture_output=True, text=True)
    assert r.returncode == 2
    assert "usage" in (r.stdout + r.stderr)


def test_fused_metric_sweep_matches_unfused(rng):
    """mc_metric_sweep (fused reduce, no (L,C,B) tensor) must equal
    metric_tensors(mc_fidelity_sweep(...)) bit-for-bit: same keys, same
    draws, same reductions (engine._metrics_core docstring contract)."""
    from code_robchar_tpu.mc import mc_metric_sweep
    n, c, b = 4, 6, 5
    h0 = chain.xx_hamiltonian(n)
    xs = jnp.asarray(np.column_stack([rng.uniform(-5, 5, (c, n)),
                                      rng.uniform(1, 10, c)]))
    noises = jnp.asarray([0.0, 0.05, 0.1])
    key = jax.random.key(3)
    for use_jacobi in (True, False):
        fids = mc_fidelity_sweep(h0, xs, noises, key, b, 0, 2, chunk=16,
                                 use_jacobi=use_jacobi)
        want = metric_tensors(fids, alpha=0.05)
        got = mc_metric_sweep(h0, xs, noises, key, b, 0, 2, chunk=16,
                              use_jacobi=use_jacobi, alpha=0.05)
        assert set(got) == set(want)
        # draws/fidelities are bitwise identical between paths; the metric
        # reductions may differ by reassociation rounding (XLA compiles the
        # B-axis mean differently inside lax.map), so pin at 1e-14.
        for k in want:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       atol=1e-14, rtol=1e-12, err_msg=k)


def test_fused_metric_sweep_chunk_invariance(rng):
    """Chunking must not change fused results (cell padding wraps)."""
    from code_robchar_tpu.mc import mc_metric_sweep
    n, c, b = 4, 5, 3
    h0 = chain.xx_hamiltonian(n)
    xs = jnp.asarray(np.column_stack([rng.uniform(-5, 5, (c, n)),
                                      rng.uniform(1, 10, c)]))
    noises = jnp.asarray([0.0, 0.08])
    key = jax.random.key(11)
    ref = mc_metric_sweep(h0, xs, noises, key, b, 0, 2, chunk=3 * 5 * 2)
    for chunk in (3, 7, 64, 8192):
        got = mc_metric_sweep(h0, xs, noises, key, b, 0, 2, chunk=chunk)
        for k in ref:
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(ref[k]),
                                       atol=1e-14, rtol=1e-12, err_msg=k)
