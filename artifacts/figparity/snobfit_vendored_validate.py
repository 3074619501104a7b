"""Validate the vendored SNOBFIT engine against the reference's shipped
SNOBFIT controller sets (VERDICT r4 next #3).

Runs the EXACT-path adapter (models/snob_skquant.SNOBSkquant on the
vendored snobfit_core engine) at the reference collection settings —
1000 Sobol restarts x 300-eval budget, ham_noisy sigma=0.05, top-300
kept (the same top-k truncation fraction as the shipped top-1000 of
~3334 restarts; see tests/test_reference_interop.py's surrogate
calibration note) — on the calibration transition (N=5 0->2) and the
surrogate's held-out gap transition (N=6 0->5), then KS-compares the
resulting RIM distributions to the shipped sets.

Writes artifacts/figparity/snobfit_vendored_results.json.
Usage (repo root): python artifacts/figparity/snobfit_vendored_validate.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp   # noqa: E402
import numpy as np        # noqa: E402
import scipy.stats        # noqa: E402


def vendored_rims(nspin, outspin, sigma, restarts=1000, topc=300, seed=0):
    from code_robchar_tpu.mc.engine import mc_metric_sweep
    from code_robchar_tpu.models import SNOBSkquant
    from code_robchar_tpu.ops import chain

    opt = SNOBSkquant(nspin, 0, outspin, ham_noisy=True, noise=sigma,
                      fid_threshold=0.1, run_until_told_to_stop=True,
                      run_until_completion_its=int(restarts * 300),
                      landscape_exploration=True, save_topc=topc,
                      repeats=restarts, testing=True, seed=seed)
    assert opt.backend_name == "vendored"
    t0 = time.time()
    opt.run()
    wall = time.time() - t0
    ours = np.asarray(opt.record["controllers"])
    h0 = chain.xx_hamiltonian_real(nspin)
    md = mc_metric_sweep(h0, jnp.asarray(ours), jnp.asarray([sigma]),
                         jax.random.key(7), 100, 0, outspin)
    return np.asarray(md[r"$W(.,\delta(x-1))$"][0]), wall, ours


def shipped_rims(nspin, outspin, sigma):
    from code_robchar_tpu.mc.engine import mc_metric_sweep
    from code_robchar_tpu.ops import chain

    path = (f"/root/reference/experiments/pipeline_nmplus2/"
            f"ppo_spin_{nspin}_0-{outspin}_c_1000.le")
    shipped = np.asarray(
        json.load(open(path))["snob"][str(sigma)]["controller"])
    h0 = chain.xx_hamiltonian_real(nspin)
    md = mc_metric_sweep(h0, jnp.asarray(shipped), jnp.asarray([sigma]),
                         jax.random.key(7), 100, 0, outspin)
    return np.asarray(md[r"$W(.,\delta(x-1))$"][0])


def main():
    out = {}
    for nspin, outspin, tag in ((5, 2, "calibration"), (6, 5, "heldout")):
        rims_v, wall, ctrls = vendored_rims(nspin, outspin, 0.05)
        rims_s = shipped_rims(nspin, outspin, 0.05)
        ks, p = scipy.stats.ks_2samp(rims_v, rims_s)
        row = {
            "transition": f"{nspin}_0-{outspin}", "role": tag,
            "ks_vs_shipped": float(ks), "p": float(p),
            "median_rim_vendored": float(np.median(rims_v)),
            "median_rim_shipped": float(np.median(rims_s)),
            "best_rim_vendored": float(np.min(rims_v)),
            "best_rim_shipped": float(np.min(rims_s)),
            "wall_seconds": round(wall, 1),
            "restarts": 1000, "topc": 300, "sigma": 0.05,
        }
        out[f"{nspin}_0-{outspin}"] = row
        np.save(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             f"snobfit_vendored_ctrls_{nspin}_{outspin}.npy"),
                ctrls)
        print(json.dumps(row), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "snobfit_vendored_results.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path)


if __name__ == "__main__":
    main()
