"""Plotting-branch coverage for the figure stack's exploration/grid
surfaces (figs/rimk.py, figs/fig5.py paper grid, generate_all's
ghostscript leg) — the sub-90% remainder of artifacts/COVERAGE.md."""

import json
import os

import numpy as np
import pytest


def _seed(tmp_path, nspin=4, n_ctrl=8):
    from code_robchar_tpu.exp.namer import ExperimentNamer

    rng = np.random.default_rng(0)
    gdir = str(tmp_path / "experiments")
    namer = ExperimentNamer(experiment_name="pipeline_figcov", Nspin=nspin,
                            inspin=0, outspin=2, numcontrollers=n_ctrl,
                            global_dir=gdir)

    def ctrls(k):
        return np.column_stack([rng.uniform(-10, 10, (k, nspin)),
                                rng.uniform(1, 20, k)]).tolist()

    json.dump({"ppo": {"0.0": {"controller": ctrls(n_ctrl)},
                       "0.05": {"controller": ctrls(n_ctrl)}},
               "lbfgs": {str(nspin): {"controller": ctrls(n_ctrl)}}},
              open(namer() + ".le", "w"))
    return gdir


def test_exploring_rimk_surfaces(tmp_path):
    from code_robchar_tpu.figs.rimk import ExploringRIMK

    gdir = _seed(tmp_path)
    x = ExploringRIMK("pipeline_figcov", Nspin=4, inspin=0, outspin=2,
                      noises=np.asarray([0.0, 0.05]), bootreps=4,
                      numcontrollers=8, filemarker=".le", topk=4,
                      global_experiments_directory=gdir)
    t = x.rim_k_tensor("ppo", noise_index=1, topk=4, p=2)
    assert set(t) >= {"RIM_1", "RIM_2", "var", "mean"}
    assert t["RIM_1"].shape[0] == 2
    assert t["RIM_1"].shape[1] >= 4      # rank ties can keep extras

    save = str(tmp_path / "figs")
    os.makedirs(save, exist_ok=True)
    paths = x.exploring_rim_k(noise_index=1, topk=4, p=2, save_dir=save,
                              arim=True)
    assert paths
    paths2, corr = x.exploring_rim_k(noise_index=1, topk=4, p=2,
                                     save_dir=save, arim=False)
    assert corr is not None

    out = x.exploring_metrics(noise_index=1, topk=6, save_dir=save)
    # returns (path, (spearman1, spearman2)) per the docstring
    path, spears = out
    assert path is None or os.path.exists(path)
    assert len(spears) == 2
    # threshold 0.5: at bootreps=4 a 0.95 yield is constant-zero
    # across controllers and spearman degenerates to NaN
    r = x.q_vs_rim_rank_agreement("ppo", noise_index=1, threshold=0.5)
    assert np.isnan(r) or -1.0 <= float(r) <= 1.0


def test_rimk_theory_helpers(tmp_path):
    from code_robchar_tpu.figs import rimk

    res = rimk.moments_vs_tails(fig_path=str(tmp_path / "mt.png"))
    assert res and os.path.exists(tmp_path / "mt.png")
    curves = rimk.p_rim_growth_curves(ps=(1, 2))
    assert set(curves) == {1, 2}
    # p-order RIM grows with p for a right-tail distribution
    assert curves[2] >= curves[1]


def test_fig5_paper_grid_with_partial_transitions(tmp_path):
    from code_robchar_tpu.figs.fig5 import ARIMGenerator, paper_grid_plot

    gdir = _seed(tmp_path)

    def experiment_fn(n, out):
        if (n, out) != (4, 2):
            return None          # grid must blank missing transitions
        return ARIMGenerator("pipeline_figcov", Nspin=4, inspin=0,
                             outspin=2, noises=np.asarray([0.0, 0.05]),
                             bootreps=4, numcontrollers=8,
                             filemarker=".le", topk=4,
                             fig_dir=str(tmp_path / "figs"),
                             global_experiments_directory=gdir)

    path = paper_grid_plot(experiment_fn, fig_dir=str(tmp_path / "figs"),
                           figname="fig5_grid_cov",
                           noise_keys=["0.0", "0.05"])
    assert os.path.exists(path)


def test_convert_to_gray_gs_branch(tmp_path, monkeypatch):
    """The ghostscript invocation branch (generate_all.py:33-38) —
    no gs ships in this image, so stub which/run and assert the exact
    conversion command is issued per pdf."""
    import shutil
    import subprocess

    from code_robchar_tpu.figs import generate_all as ga

    pdf = tmp_path / "a.pdf"
    pdf.write_bytes(b"%PDF-1.4\n%%EOF\n")
    calls = []

    def fake_run(cmd, check=True, capture_output=True):
        calls.append(cmd)
        open(cmd[1].split("=", 1)[1], "wb").write(b"%PDF-1.4 gray\n")
        return subprocess.CompletedProcess(cmd, 0)

    monkeypatch.setattr(shutil, "which", lambda name: "/usr/bin/gs"
                        if name == "gs" else None)
    monkeypatch.setattr(subprocess, "run", fake_run)
    done = ga.convert_to_gray(str(tmp_path))
    assert len(done) == 1 and len(calls) == 1
    assert calls[0][0] == "/usr/bin/gs"
    assert "-sColorConversionStrategy=Gray" in calls[0]
    assert os.path.exists(done[0])


def test_fig8_fallback_init_and_partial_stores(tmp_path):
    """NStochOpt without .le_nsh/.le_sh scaling stores: the
    FileNotFoundError fallback loads the plain .le store for both
    dicts (fig8.py:57-60), missing algos KeyError-continue, and the
    lbfgs no-noise bench KeyError passes (224-225)."""
    from code_robchar_tpu.figs.fig8 import NStochOpt

    gdir = _seed(tmp_path)
    s = NStochOpt("pipeline_figcov", Nspin=4, inspin=0, outspin=2,
                  noises=np.asarray([0.0, 0.05]), bootreps=2,
                  numcontrollers=8, filemarker=".le",
                  fig_dir=str(tmp_path / "figs"),
                  global_experiments_directory=gdir)
    assert s.lbfgs_no_noise_bench_nlvl == ""
    with pytest.raises(KeyError, match="adam"):
        s.get_arims("adam", nlvl="0.05", marker="", cdict=s.c_dict_sh)
    path = s.all_noises_combined_scaling_plot()
    assert path is None or os.path.exists(path)


def test_generate_all_scaling_leg(tmp_path, monkeypatch):
    """generate_all's NStochOpt scaling leg (generate_all.py:82-90):
    the success path and the FileNotFoundError skip."""
    import code_robchar_tpu.figs as figs_pkg
    from code_robchar_tpu.figs import generate_all as ga

    class _Fig:
        def __init__(self, *a, **k):
            pass

        def _pdf(self, name):
            p = tmp_path / "figs" / f"{name}.pdf"
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_bytes(b"%PDF-1.4\n%%EOF\n")
            return str(p)

        def plot_figs_3_6_10_11_12(self, **k):
            return self._pdf(k.get("figname", "f"))

        def plot_fig3e(self, **k):
            return self._pdf("f3e")

        def plot_kendalltaus(self, **k):
            return [self._pdf("f4")]

        def plot_grouped_boxplots(self, **k):
            return self._pdf("f7")

        def get_ARIM_plot(self, **k):
            return self._pdf("f5")

    class _Scaling(_Fig):
        def all_noises_combined_scaling_plot(self):
            return self._pdf("f8")

    class _MissingScaling(_Fig):
        def __init__(self, *a, **k):
            raise FileNotFoundError("no scaling store")

    for cls in ("IndividualContComparisons", "KTRConsistency",
                "ARIMGenerator"):
        monkeypatch.setattr(figs_pkg, cls, _Fig)
    monkeypatch.setattr(figs_pkg, "NStochOpt", _Scaling)
    paths = ga.generate_all(str(tmp_path / "exp"), str(tmp_path / "figs"),
                            scaling_experiment="some_scaling",
                            grayscale=False)
    assert any(p.endswith("f8.pdf") for p in paths)

    monkeypatch.setattr(figs_pkg, "NStochOpt", _MissingScaling)
    paths2 = ga.generate_all(str(tmp_path / "exp"),
                             str(tmp_path / "figs"),
                             scaling_experiment="some_scaling",
                             grayscale=False)
    assert not any(p.endswith("f8.pdf") for p in paths2)


def test_fig8_sidecar_staleness_matrix(tmp_path):
    """The fig8 ARIM-cache sidecar contract (round-4 stale-column trap
    fix, fig8.py:85-148): cache hits only when BOTH the fcall row keys
    and the (noise grid, bootreps, seed) column signature match;
    legacy list-format sidecars still validate rows; a pre-sidecar
    pickle warns and pins its assumption."""
    import pickle
    import warnings

    from code_robchar_tpu.exp.namer import ExperimentNamer
    from code_robchar_tpu.figs.fig8 import NStochOpt

    rng = np.random.default_rng(0)
    gdir = str(tmp_path / "experiments")
    namer = ExperimentNamer(experiment_name="pipeline_scalecov", Nspin=4,
                            inspin=0, outspin=2, numcontrollers=4,
                            global_dir=gdir)

    def ctrls(k):
        return np.column_stack([rng.uniform(-10, 10, (k, 4)),
                                rng.uniform(1, 20, k)]).tolist()

    scaling = {"ppo": {"0.05": {"1000": ctrls(4), "2000": ctrls(4)}}}
    json.dump(scaling, open(namer() + ".le_nsh", "w"))
    json.dump(scaling, open(namer() + ".le_sh", "w"))
    json.dump({"ppo": {"0.05": {"controller": ctrls(4)}}},
              open(namer() + ".le", "w"))

    def make(bootreps=2):
        return NStochOpt("pipeline_scalecov", Nspin=4, inspin=0,
                         outspin=2, noises=np.asarray([0.0, 0.05]),
                         bootreps=bootreps, numcontrollers=4,
                         filemarker=".le", fig_dir=str(tmp_path / "figs"),
                         global_experiments_directory=gdir)

    s = make()
    arims, keys = s.get_arims("ppo", nlvl="0.05", marker="",
                              cdict=s.c_dict_sh)
    assert arims.shape == (2, 2) and keys == ["1000", "2000"]
    save = s.get_controller_name + "_arims_ppo0.05.pickle"
    assert os.path.exists(save) and os.path.exists(save + ".fckeys.json")
    mtime = os.path.getmtime(save)

    # 1. clean cache hit
    arims2, _ = s.get_arims("ppo", nlvl="0.05", marker="",
                            cdict=s.c_dict_sh)
    np.testing.assert_array_equal(arims2, arims)
    assert os.path.getmtime(save) == mtime

    # 2. legacy list-format sidecar with matching keys: still a hit
    json.dump(["1000", "2000"], open(save + ".fckeys.json", "w"))
    arims3, _ = s.get_arims("ppo", nlvl="0.05", marker="",
                            cdict=s.c_dict_sh)
    np.testing.assert_array_equal(arims3, arims)

    # 3. different bootreps -> column signature mismatch -> recompute
    json.dump({"fckeys": ["1000", "2000"],
               "cols": {"noises": [0.0, 0.05], "bootreps": 2, "seed": 0}},
              open(save + ".fckeys.json", "w"))
    s3 = make(bootreps=3)
    s3.get_arims("ppo", nlvl="0.05", marker="", cdict=s3.c_dict_sh)
    sidecar = json.load(open(save + ".fckeys.json"))
    assert sidecar["cols"]["bootreps"] == 3      # cache was rewritten

    # 4. pre-sidecar pickle (no keyfile), row count matches: warn + pin
    os.remove(save + ".fckeys.json")
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        s3.get_arims("ppo", nlvl="0.05", marker="", cdict=s3.c_dict_sh)
    assert any("predates" in str(x.message) for x in w)
    assert os.path.exists(save + ".fckeys.json")

    # 5. changed fcall keys (same count) -> stale -> recompute
    renamed = {"ppo": {"0.05": {"1000": scaling["ppo"]["0.05"]["1000"],
                                "3000": scaling["ppo"]["0.05"]["2000"]}}}
    _, keys5 = s3.get_arims("ppo", nlvl="0.05", marker="", cdict=renamed)
    assert keys5 == ["1000", "3000"]
    sidecar5 = json.load(open(save + ".fckeys.json"))
    assert sidecar5["fckeys"] == ["1000", "3000"]

    # 6. reference pickle with no sidecar and a MISMATCHED row count:
    # keys cannot label the rows -> index-axis fallback (keys None)
    os.remove(save + ".fckeys.json")
    with open(save, "wb") as f:
        pickle.dump(np.zeros((5, 2)), f)
    arims6, keys6 = s3.get_arims("ppo", nlvl="0.05", marker="",
                                 cdict=renamed)
    assert keys6 is None and arims6.shape == (5, 2)
