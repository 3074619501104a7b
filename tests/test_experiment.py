"""Experiment orchestrator tests: .le schema, respawn, retry budget, CLI."""

import json
import os

import numpy as np
import pytest

from code_robchar_tpu.exp import Experiment, ExperimentNamer
from code_robchar_tpu.exp.cli import get_noise_analysis_args, get_mcsim_args
from code_robchar_tpu.mc import MCDataSim


def small_exp(tmp_path, **over):
    kw = dict(Nspin=4, inspin=0, outspin=2, fid_threshold=0.0,
              ham_noisy=True, noises=np.linspace(0, 0.1, 2),
              run_until_told_to_stop=True, run_until_completion_its=600,
              runs=8, records_update_rate=300,
              global_dir=str(tmp_path / "experiments"), testing=True)
    kw.update(over)
    return Experiment("pipeline_unit", **kw)


def test_namer_path_convention(tmp_path):
    n = ExperimentNamer("exp1", Nspin=5, inspin=0, outspin=2,
                        numcontrollers=100,
                        global_dir=str(tmp_path / "experiments"))
    assert n.controller_store().endswith("exp1/ppo_spin_5_0-2_c_100")
    n()  # call form creates the home dir
    assert os.path.isdir(n.home)


def test_singlerun_ccollector_le_schema_and_mc_interop(tmp_path):
    exp = small_exp(tmp_path)
    exp.singlerun_ccollector(model_choices=["lbfgs", "nmplus"])
    assert exp.filename.endswith(".le")
    data = json.load(open(exp.filename))
    # lbfgs keyed by str(Nspin); others by noise value
    assert "4" in data["lbfgs"] or 4 in data["lbfgs"]
    assert any(k not in ("4",) for k in data["nmplus"])
    ctrls = list(data["nmplus"].values())[0]["controller"]
    assert len(ctrls[0]) == 5

    # the .le store feeds MCDataSim directly (cache-format interop)
    noise_key = list(data["nmplus"].keys())[0]
    # numcontrollers must match the store filename (the Experiment's runs=8);
    # short stores NaN-pad (mcsim.py:434-443 semantics)
    sim = MCDataSim("pipeline_unit", Nspin=4, inspin=0, outspin=2,
                    noises=np.linspace(0, 0.1, 2), bootreps=3,
                    numcontrollers=8, filemarker=".le",
                    global_experiments_directory=str(
                        tmp_path / "experiments"))
    md = sim.get_metrics_dict(noise_key, algoname="nmplus")
    assert "nmplus" in md


def test_respawn_skips_completed_cells(tmp_path):
    exp = small_exp(tmp_path, respawn_from_checkpoint=True)
    exp.singlerun_ccollector(model_choices=["lbfgs"])
    mtime = os.path.getmtime(exp.filename)
    data1 = json.load(open(exp.filename))

    exp2 = small_exp(tmp_path, respawn_from_checkpoint=True)
    exp2.singlerun_ccollector(model_choices=["lbfgs"])
    data2 = json.load(open(exp2.filename))
    # identical content: all cells were skipped on respawn
    assert data1 == data2


class _NoiseTaggedStub:
    """Model stub whose controllers encode the noise it was run at, so a
    store can be traced back to the exact (noise, run#) that produced it."""

    instances = []

    def __init__(self, **kw):
        self.noise = None
        self.fid_threshold = None
        self.runs_done = 0
        _NoiseTaggedStub.instances.append(self)

    def run(self):
        self.runs_done += 1
        tag = float(self.noise)
        self.record = {
            "time_to_get_fid": 0.0, "func_calls": 1, "iterations": 1,
            "repeats": 1, "best_fid": 1.0,
            "controller": [tag] * 5,
            "controllers": [[tag] * 5, [tag] * 5],
        }
        self.records = {"300": [[tag] * 5]}


def test_lbfgs_cell_runs_first_noise_only_and_survives_respawn(tmp_path):
    """The reference runs the lbfgs cell ONCE, at the FIRST noise level,
    and skips it for every subsequent noise — in-memory via the Nspin
    key probe (noise_analysis.py:315-320: `cond = self.spin not in
    results["lbfgs"]` holds the int key after the first write) and
    across a JSON respawn via the str-key loop (noise_analysis.py:
    325-332: `key == str(self.spin)` forces cond False).  The store
    therefore carries FIRST-noise lbfgs runs, never overwritten by
    later noises (VERDICT r4 next #7)."""
    _NoiseTaggedStub.instances = []
    noises = np.asarray([0.0, 0.1])
    exp = small_exp(tmp_path, noises=noises)
    exp.init_chosen_models = lambda choices: {"lbfgs": _NoiseTaggedStub}
    exp.singlerun_ccollector(model_choices=["lbfgs"])

    # exactly one lbfgs run despite two noise levels…
    assert sum(s.runs_done for s in _NoiseTaggedStub.instances) == 1
    data = json.load(open(exp.filename))
    assert list(data["lbfgs"].keys()) == ["4"]  # keyed by str(Nspin)
    # …and the stored controllers are the FIRST noise's (0.0), not the
    # last's (0.1): first-noise wins, no overwrite
    assert data["lbfgs"]["4"]["controller"][0][0] == 0.0

    # respawn leg: a fresh Experiment over the same store must skip the
    # lbfgs cell for BOTH noises (str(Nspin) key probe post-JSON-reload)
    _NoiseTaggedStub.instances = []
    exp2 = small_exp(tmp_path, noises=noises)
    exp2.init_chosen_models = lambda choices: {"lbfgs": _NoiseTaggedStub}
    exp2.singlerun_ccollector(model_choices=["lbfgs"])
    assert sum(s.runs_done for s in _NoiseTaggedStub.instances) == 0
    assert json.load(open(exp2.filename)) == data


def test_var_noise_lbfgs_first_noise_only(tmp_path):
    """Same first-noise-wins contract on the run_var_noise driver
    (noise_analysis.py:159-173): the lbfgs cell accumulates `runs`
    records at the first noise and is skipped at subsequent noises."""
    _NoiseTaggedStub.instances = []
    exp = small_exp(tmp_path, runs=3, noises=np.asarray([0.0, 0.1]))
    exp.init_chosen_models = lambda choices: {"lbfgs": _NoiseTaggedStub}
    exp.run_var_noise(model_choices=["lbfgs"])
    assert sum(s.runs_done for s in _NoiseTaggedStub.instances) == 3
    data = json.load(open(exp.filename))
    cell = data["lbfgs"]["4"]
    assert len(cell["controller"]) == 3
    assert all(c[0] == 0.0 for c in cell["controller"])


def test_var_noise_record_schema(tmp_path):
    exp = small_exp(tmp_path, runs=2,
                    run_until_told_to_stop=False, fid_threshold=0.2,
                    noises=np.asarray([0.05]))
    exp.run_var_noise(model_choices="nmplus")
    data = json.load(open(exp.filename))
    cell = list(data["nmplus"].values())[0]
    for k in ("time_to_get_fid", "func_calls", "iterations", "repeats",
              "best_fid", "controller"):
        assert k in cell
        assert len(cell[k]) == 2  # one entry per run


def test_retry_budget_gives_up(tmp_path):
    exp = small_exp(tmp_path, runs=3, chances=2)

    class Boom:
        def __init__(self, **kw):
            raise RuntimeError("boom")

    exp.init_chosen_models = lambda choices: {"lbfgs": Boom}
    exp.run_var_noise(model_choices="lbfgs")  # must not raise
    data = json.load(open(exp.filename))
    assert data["lbfgs"] == {}


def test_nstoch_sampling_stores_checkpoints(tmp_path):
    exp = small_exp(tmp_path, noises=np.asarray([0.05]), runs=4,
                    run_until_completion_its=900, records_update_rate=300)
    exp.singlerun_ccollector_nstoch_sampling(model_choices=["snob"])
    assert exp.filename.endswith(".le_sh")
    data = json.load(open(exp.filename))
    cps = list(data["snob"].values())[0]
    assert len(cps) >= 1  # {fcalls: [controllers]} checkpoints
    first = list(cps.values())[0]
    assert len(first[0]) == 5


def test_cli_flag_surface():
    args = get_noise_analysis_args([
        "--nspin", "4", "--outspin", "2", "--num_controllers", "10",
        "--fid_noisy", "False", "--ham_noisy", "True"])
    assert args.nspin == 4 and args.num_controllers == 10
    assert args.fid_noisy is False     # the type=bool trap, fixed
    assert args.ham_noisy is True
    m = get_mcsim_args(["--bootreps", "7", "--training_noise", "0.05"])
    assert m.bootreps == 7 and m.training_noise == "0.05"
