"""Side-by-side figure regeneration: the reference's OWN scripts vs ours.

VERDICT r2 missing #2 / next #3: FIGPARITY.md argues figure parity from
curve-data equality (.mc at 1e-10, .mcm exact); this closes the loop by
actually EXECUTING the reference's generate_fig3.py /
generate_arim_all_fig5.py plotting code (imported from /root/reference,
unmodified) and this framework's figs/ on the same shipped caches, hooking
matplotlib to capture every plotted array, and pairing the arrays
programmatically.

Method notes:
- Each side runs in its own sandbox cwd with the shipped
  experiments/pipeline_nmplus2 files symlinked per-file (the reference
  tree is read-only; per-file links let each side write its own .mcm
  caches without seeing the other's — sharing one cwd would let our side
  cache-hit the reference-computed .mcm and trivialise the comparison).
- Constructors use bootreps=1 so the shipped br_1 cache names hit
  (SURVEY quirk #4: the scripts' own bootreps=100 misses every shipped
  cache and would trigger a full scipy MC recompute).
- The recorder patches Axes.plot/pcolor/pcolormesh/fill_between/errorbar
  (semilogy routes through plot); numeric args with >1 element are
  captured.  Matching: for each reference array, find an unused array of
  ours for the same figure and method, equal within atol/rtol 1e-9
  (NaN-position-aware).

Output: sidebyside_report.json + stdout summary.

Usage (repo root): python artifacts/figparity/sidebyside/run_sidebyside.py
"""

import json
import os
import shutil
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.abspath(os.path.join(HERE, "..", "..", ".."))
REF = "/root/reference"
sys.path.insert(0, REPO)

# parity regime: the reference side is float64 numpy; our side must run
# its metric pipeline on CPU x64, not the f32 TPU backend
import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

RECORD = []          # (phase, figure, method, [arrays])
PHASE = ["?", "?"]   # [side, figure-tag]


def install_recorder():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.axes

    def wrap(orig, name):
        def f(self, *args, **kwargs):
            arrs = []
            # DATA kwargs too: the pyplot boilerplate forwards trailing
            # positional data as KEYWORDS (e.g. plt.fill_between passes
            # y2=...), so args alone misses arrays.  Whitelisted keys
            # only — style kwargs (RGB color tuples, dash patterns)
            # would otherwise be captured as small float arrays and
            # break matching whenever the two stacks style differently.
            data_keys = ("x", "y", "y1", "y2", "yerr", "xerr")
            vals = list(args) + [kwargs[k] for k in sorted(kwargs)
                                 if k in data_keys]
            for a in vals:
                try:
                    v = np.asarray(a)
                except Exception:
                    continue
                if v.dtype.kind in "fiu" and v.size > 1:
                    arrs.append(v.astype(float))
            if arrs:
                RECORD.append((PHASE[0], PHASE[1], name, arrs))
            return orig(self, *args, **kwargs)
        return f

    for name in ("plot", "pcolor", "pcolormesh", "fill_between",
                 "errorbar"):
        orig = getattr(matplotlib.axes.Axes, name)
        if getattr(orig, "_sxs_wrapped", False):
            continue
        w = wrap(orig, name)
        w._sxs_wrapped = True
        setattr(matplotlib.axes.Axes, name, w)


def make_sandbox(tag):
    """Reusable sandbox: computed .mcm caches from earlier runs persist
    (they are deterministic functions of the symlinked shipped .mc), so
    re-runs skip the expensive metric recompute."""
    box = os.path.join("/tmp/sidebyside", tag)
    os.makedirs(os.path.join(box, "gray_scale_adjusted_paperfigs"),
                exist_ok=True)
    os.makedirs(os.path.join(box, "paperfigs"), exist_ok=True)
    for pipe in ("pipeline_nmplus2",
                 "pipeline_nonstoch_experiments_others_comp"):
        exp = os.path.join(box, "experiments", pipe)
        os.makedirs(exp, exist_ok=True)
        src = os.path.join(REF, "experiments", pipe)
        for f in os.listdir(src):
            dst = os.path.join(exp, f)
            if not os.path.lexists(dst):
                os.symlink(os.path.join(src, f), dst)
    return box


NOISES = np.linspace(0, 0.1, 11)
# the paper grid is 8 transitions (generate_arim_all_fig5.py:217) but the
# reference only SHIPS .le controller stores for 6 of them (no N=7) —
# its own script crashes on the N=7 panels against shipped data, so the
# side-by-side covers the 6 panels both sides can draw.
FIG5_GRID = [(4, 2), (5, 2), (6, 3), (4, 3), (5, 4), (6, 5)]


def install_import_stubs():
    """The reference's figure scripts transitively import its optimizer
    stack (generate_fig3 -> mcsim -> noise_analysis -> qnewton), which
    needs packages this container lacks (skquant/SQSnobFit, IPython).
    None of them is touched by the PLOTTING code paths exercised here, so
    inert stand-ins keep the imports satisfied."""
    import types

    def ensure(name, attrs):
        try:
            __import__(name)
            return
        except ImportError:
            pass
        parts = name.split(".")
        for i in range(len(parts)):
            mod_name = ".".join(parts[:i + 1])
            if mod_name not in sys.modules:
                sys.modules[mod_name] = types.ModuleType(mod_name)
            if i:
                setattr(sys.modules[".".join(parts[:i])], parts[i],
                        sys.modules[mod_name])
        for k, v in attrs.items():
            setattr(sys.modules[name], k, v)

    ensure("skquant.opt", {"minimize": None})
    ensure("SQSnobFit", {"optset": lambda **kw: None})
    ensure("IPython.display", {"clear_output": lambda *a, **k: None,
                               "display": lambda *a, **k: None})


def run_reference_side():
    box = make_sandbox("ref")
    os.chdir(box)
    sys.path.insert(0, REF)
    install_import_stubs()
    PHASE[0] = "ref"

    import generate_fig3 as g3
    import generate_arim_all_fig5 as g5

    PHASE[1] = "fig3"
    y = g3.Individual_cont_comparisons(
        experiment_name="pipeline_nmplus2", Nspin=5, outspin=2,
        bootreps=1, parallel=False, numcontrollers=1000, filemarker=".le",
        noises=NOISES)
    y.plot_figs_3_6_10_11_12(noise_keys=NOISES[:1], figname="fig3")
    PHASE[1] = "fig3e"
    y.plot_fig3e(noise_keys=NOISES[:1], figname="fig3e")

    import matplotlib.pyplot as plt
    for n, out in FIG5_GRID:
        PHASE[1] = f"fig5_{n}_{out}"
        a = g5.ARIM_generator(
            experiment_name="pipeline_nmplus2", Nspin=n, outspin=out,
            bootreps=1, parallel=False, numcontrollers=1000,
            filemarker=".le", noises=NOISES)
        _, ax = plt.subplots()
        a.get_ARIM(noise_keys=NOISES[:6], plot_error=True, ax2=ax)
        plt.close("all")

    # fig 8: the reference class auto-plots in __init__; the shipped
    # ARIM .pickle caches make every get_arims a pure cache hit
    PHASE[1] = "fig8"
    import gen_fig_8_arim_fcall_scaling as g8
    g8.NStochOpt(experiment_name="pipeline_nonstoch_experiments_"
                 "others_comp", Nspin=5, outspin=2, bootreps=100,
                 parallel=False, numcontrollers=100, filemarker=".le",
                 noises=NOISES)
    plt.close("all")

    sys.path.remove(REF)
    for m in ("generate_fig3", "generate_arim_all_fig5",
              "gen_fig_8_arim_fcall_scaling", "mcsim",
              "noise_model", "wd_sortof_fast_implementation"):
        sys.modules.pop(m, None)


def run_our_side():
    box = make_sandbox("ours")
    os.chdir(box)
    PHASE[0] = "ours"

    from code_robchar_tpu.figs import IndividualContComparisons, \
        ARIMGenerator

    kw = dict(bootreps=1, numcontrollers=1000, filemarker=".le",
              noises=NOISES, global_experiments_directory="experiments/")
    PHASE[1] = "fig3"
    y = IndividualContComparisons("pipeline_nmplus2", Nspin=5, inspin=0,
                                  outspin=2, fig_dir="paperfigs", **kw)
    y.plot_figs_3_6_10_11_12(noise_keys=NOISES[:1], figname="fig3")
    PHASE[1] = "fig3e"
    y.plot_fig3e(noise_keys=NOISES[:1], figname="fig3e")

    import matplotlib.pyplot as plt
    for n, out in FIG5_GRID:
        PHASE[1] = f"fig5_{n}_{out}"
        a = ARIMGenerator("pipeline_nmplus2", Nspin=n, inspin=0,
                          outspin=out, fig_dir="paperfigs", **kw)
        _, ax = plt.subplots()
        a.get_ARIM(noise_keys=NOISES[:6], plot_error=True, ax=ax)
        plt.close("all")

    # fig 8 from the same shipped pickles; reference_axis_compat replays
    # the reference's index * 1e6 x-axis quirk so the marks align
    PHASE[1] = "fig8"
    from code_robchar_tpu.figs import NStochOpt
    s8 = NStochOpt("pipeline_nonstoch_experiments_others_comp", Nspin=5,
                   inspin=0, outspin=2, noises=NOISES, bootreps=100,
                   numcontrollers=100, filemarker=".le",
                   fig_dir="paperfigs",
                   global_experiments_directory="experiments/",
                   reference_axis_compat=True)
    s8.all_noises_combined_scaling_plot()
    plt.close("all")


#: Deterministic data marks (curves, heatmaps) must agree to 1e-9.
#: fill_between draws the +-2*sigma-hat BOOTSTRAP bands: the band CENTER
#: is the deterministic curve (1e-9), but sigma-hat is a 100-resample
#: Monte-Carlo estimate drawn from each side's own RNG stream, so the
#: band WIDTH can only agree to bootstrap sampling error of sigma-hat
#: (rel. ~1/sqrt(2*100) ~ 7% per point, worst-case excursions a few x
#: that) — widths are gated at 50% relative + 1e-4 absolute.
#: pcolormesh is excluded: it is colorbar furniture (the data heatmap is
#: the pcolor call), and the two stacks draw colorbars differently.
SKIP_METHODS = {"pcolormesh"}


def arrays_equal(a, b, atol=1e-9):
    if a.shape != b.shape:
        return False
    am, bm = np.isnan(a), np.isnan(b)
    if not np.array_equal(am, bm):
        return False
    return np.allclose(a[~am], b[~bm], atol=atol, rtol=atol)


def calls_equal(method, arrs, cand):
    if len(cand) != len(arrs):
        return False
    if method == "fill_between" and len(arrs) == 3:
        (x1, lo1, hi1), (x2, lo2, hi2) = arrs, cand
        if not arrays_equal(x1, x2):
            return False
        c1, c2 = (lo1 + hi1) / 2, (lo2 + hi2) / 2
        w1, w2 = (hi1 - lo1) / 2, (hi2 - lo2) / 2
        if not arrays_equal(c1, c2):
            return False
        return (w1.shape == w2.shape and
                np.allclose(w1, w2, atol=1e-4, rtol=0.5))
    return all(arrays_equal(a, b) for a, b in zip(arrs, cand))


def compare():
    def collect(side):
        out = {}
        for phase, fig, method, arrs in RECORD:
            if phase != side:
                continue
            # drop style-only short arrays; keep data marks
            out.setdefault((fig, method), []).append(arrs)
        return out

    ref, ours = collect("ref"), collect("ours")
    report = {}
    total_ref = matched = 0
    for key, ref_calls in sorted(ref.items()):
        fig, method = key
        if method in SKIP_METHODS:
            continue
        our_calls = list(ours.get(key, []))
        used = [False] * len(our_calls)
        unmatched = []
        for arrs in ref_calls:
            # a call matches if every captured array in it has an
            # equal counterpart (positionally) in one call of ours
            hit = False
            for j, cand in enumerate(our_calls):
                if used[j]:
                    continue
                if calls_equal(method, arrs, cand):
                    used[j] = True
                    hit = True
                    break
            total_ref += 1
            matched += hit
            if not hit:
                unmatched.append([list(a.shape) for a in arrs])
        report["/".join(key)] = {
            "ref_calls": len(ref_calls), "our_calls": len(our_calls),
            "matched": sum(used), "unmatched_ref_shapes": unmatched}
    return report, total_ref, matched


def main():
    install_recorder()
    run_reference_side()
    run_our_side()
    os.chdir(REPO)
    report, total, matched = compare()
    out = {"total_reference_plot_calls": total, "matched": matched,
           "by_figure_method": report}
    path = os.path.join(HERE, "sidebyside_report.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: f"{v['matched']}/{v['ref_calls']}"
                      for k, v in report.items()}, indent=1))
    print(f"[sidebyside] {matched}/{total} reference plot calls "
          f"reproduced bit-comparably; report -> {path}")
    return matched, total


if __name__ == "__main__":
    m, t = main()
    sys.exit(0 if m == t else 1)
