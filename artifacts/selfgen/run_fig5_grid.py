"""Render the paper's full 2x4 ARIM grid (fig 5) from the SELF-GENERATED
controller stores — the complete figure from zero shipped data.

Run from the repo root after run_selfgen.py has produced all eight
transitions:  python artifacts/selfgen/run_fig5_grid.py
"""

import os
import sys

sys.path.insert(0, os.getcwd())

import numpy as np  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
EXP_DIR = os.path.join(HERE, "experiments")
FIG_DIR = os.path.join(HERE, "paperfigs")


def main():
    from code_robchar_tpu.figs import ARIMGenerator
    from code_robchar_tpu.figs.fig5 import paper_grid_plot

    def experiment_fn(n, out):
        store = os.path.join(EXP_DIR, "pipeline_selfgen",
                             f"ppo_spin_{n}_0-{out}_c_1000.le")
        if not os.path.exists(store):
            print(f"missing transition N={n} 0->{out}; panel skipped")
            return None
        return ARIMGenerator("pipeline_selfgen", Nspin=n, inspin=0,
                             outspin=out, noises=np.linspace(0, 0.1, 11),
                             bootreps=100, numcontrollers=1000,
                             filemarker=".le", fig_dir=FIG_DIR,
                             global_experiments_directory=EXP_DIR)

    path = paper_grid_plot(experiment_fn, fig_dir=FIG_DIR,
                           figname="selfgen_fig5_all")
    print("grid:", path)


if __name__ == "__main__":
    main()
