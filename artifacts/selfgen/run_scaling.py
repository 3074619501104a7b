"""From-scratch ARIM-fcall-scaling artifact (fig 8 structure).

run_stoch_experiments.py semantics at a reduced budget: fcall-checkpointed
controller sets (.le_sh stochastic + .le_nsh fixed-ham) for N=5 0->2, all
four optimizer families, 100 controllers, 2e6-fcall budget with
checkpoints every 5e4 calls (40 checkpoints — the reference's shipped
scaling data has the same checkpoint count at 1e6 spacing over 4e7).

Respawn-safe: re-running resumes at the next unfinished (model, noise)
cell, so the job can be driven in bounded slices.
Run from the repo root:  python artifacts/selfgen/run_scaling.py
"""

import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
EXP_DIR = os.path.join(HERE, "experiments")
FIG_DIR = os.path.join(HERE, "paperfigs")
N, OUT, C = 5, 2, 100
BUDGET, RATE = int(2e6), 5e4


def run(use_fixed_ham: bool):
    from code_robchar_tpu.exp.experiment import Experiment

    noises = (np.array([0.01, 0.05, 0.1]) if use_fixed_ham
              else np.array([0.0, 0.01, 0.05, 0.1]))
    e = Experiment("pipeline_selfgen_scaling", Nspin=N, inspin=0,
                   outspin=OUT, runs=C, noises=noises, fid_threshold=0.1,
                   ham_noisy=not use_fixed_ham, use_fixed_ham=use_fixed_ham,
                   run_until_told_to_stop=True,
                   run_until_completion_its=BUDGET,
                   records_update_rate=RATE, testing=True,
                   global_dir=EXP_DIR)
    # Experiment passes identical kwargs to every model; num_agents is a
    # PPO-only kwarg, so drive ppo in a second pass like run_selfgen.py
    e.models = ["lbfgs", "nmplus", "snob"]
    e.singlerun_ccollector_nstoch_sampling()

    import json
    d = json.load(open(e.filename))
    if "ppo" not in d:
        d["ppo"] = {}
        json.dump(d, open(e.filename, "w"))
    e2 = Experiment("pipeline_selfgen_scaling", Nspin=N, inspin=0,
                    outspin=OUT, runs=C, noises=noises, fid_threshold=0.1,
                    ham_noisy=not use_fixed_ham,
                    use_fixed_ham=use_fixed_ham,
                    run_until_told_to_stop=True,
                    run_until_completion_its=BUDGET,
                    records_update_rate=RATE, testing=True,
                    global_dir=EXP_DIR)
    e2.args["num_agents"] = 64
    e2.models = ["ppo"]
    e2.singlerun_ccollector_nstoch_sampling()
    return e2.filename


def figure():
    from code_robchar_tpu.figs import NStochOpt

    s = NStochOpt("pipeline_selfgen_scaling", Nspin=N, inspin=0,
                  outspin=OUT, noises=np.linspace(0, 0.1, 11),
                  bootreps=100, numcontrollers=C, filemarker=".le",
                  fig_dir=FIG_DIR, global_experiments_directory=EXP_DIR)
    return s.all_noises_combined_scaling_plot(
        figname=f"selfgen_fig8_N{N}_0-{OUT}")


if __name__ == "__main__":
    t0 = time.time()
    run(use_fixed_ham=False)
    print(f"[scaling] stoch pass done at {time.time() - t0:.0f}s")
    run(use_fixed_ham=True)
    print(f"[scaling] nonstoch pass done at {time.time() - t0:.0f}s")
    print("[scaling] figure:", figure())
    print(f"[scaling] TOTAL {time.time() - t0:.0f}s")
