"""Interop with the reference's SHIPPED experiment data.

Loads the real pipeline_nmplus2 controller store (1000 controllers/algo,
produced by the reference implementation) and runs the MC characterisation
+ figure stack over it — the strongest end-to-end proof that a reference
user can point this framework at their existing data.
"""

import os
import shutil

import numpy as np
import pytest

REF_STORE = ("/root/reference/experiments/pipeline_nmplus2/"
             "ppo_spin_5_0-2_c_1000.le")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_STORE),
                                reason="reference data not mounted")


@pytest.fixture
def shipped(tmp_path):
    home = tmp_path / "experiments" / "pipeline_nmplus2"
    home.mkdir(parents=True)
    shutil.copy(REF_STORE, home / os.path.basename(REF_STORE))
    return str(tmp_path / "experiments")


def test_shipped_store_characterises(shipped):
    from code_robchar_tpu.mc import MCDataSim
    sim = MCDataSim("pipeline_nmplus2", Nspin=5, inspin=0, outspin=2,
                    noises=np.linspace(0, 0.1, 3), bootreps=2,
                    numcontrollers=1000, filemarker=".le", topk=100,
                    global_experiments_directory=shipped, use_jacobi=True)
    assert set(sim.algos) == {"nmplus", "snob", "ppo", "lbfgs"}
    md = sim.get_metrics_dict("0.0", algoname="ppo")
    rim = np.array(md["ppo"][r"$W(.,\delta(x-1))$"])
    assert rim.shape == (3, 1000)
    # shipped ppo sigma_train=0 controllers achieve high zero-noise
    # fidelity: the best RIM at sigma_sim=0 must be tiny
    assert np.nanmin(rim[0]) < 0.02
    # robustness physics: median RIM grows with simulation noise
    assert np.nanmedian(rim[2]) > np.nanmedian(rim[0])


def test_shipped_lbfgs_baseline_key(shipped):
    from code_robchar_tpu.mc import MCDataSim
    sim = MCDataSim("pipeline_nmplus2", Nspin=5, inspin=0, outspin=2,
                    noises=np.linspace(0, 0.1, 2), bootreps=2,
                    numcontrollers=1000, filemarker=".le", topk=50,
                    global_experiments_directory=shipped, use_jacobi=True)
    # lbfgs keyed by str(Nspin) (SURVEY.md quirk 8)
    xs = sim._controller_matrix("lbfgs", None)
    assert xs.shape == (1000, 6)
    md = sim.get_metrics_dict(None, algoname="lbfgs")
    assert "lbfgs" in md


LEGACY_DIR = "/root/reference/noisy_analysis"


@pytest.mark.skipif(not os.path.exists(LEGACY_DIR),
                    reason="reference data not mounted")
def test_fig1_reads_real_legacy_records():
    """The CDF-area figure consumes the reference's actual legacy
    noisy_analysis records (produced by an older generation of the
    reference codebase — the realest schema-compat check available)."""
    from code_robchar_tpu.figs import CDFAreaExample
    ex = CDFAreaExample(LEGACY_DIR, spin=5, inspin=0, outspin=2,
                        bootreps=4, controllers=20)
    noises, fl, fp = ex.get_sd_results(np.linspace(0, 0.3, 3))
    assert fl.shape == (2, 20, 4)
    # shipped lbfgs controllers reach high fidelity at low noise
    assert np.nanmax(fl[0]) > 0.9
    xs, ca, cb = ex.joint_ecdfs(fl[0, 0], fp[0, 0])
    assert (np.diff(ca) >= 0).all() and ca[-1] <= 1.0
