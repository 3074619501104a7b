"""Frozen scipy L-BFGS-B outcome-distribution baseline (VERDICT r2 #6).

Generates, ONCE, the controller-fidelity distribution that the reference's
noiseless optimizer stack produces: multi-start
``scipy.optimize.fmin_l_bfgs_b`` with the exact analytic gradient and box
bounds (qnewton.py:497), uniform inits in the bound box, on the N=4 0->2
and N=5 0->2 transitions.  The gradient oracle is this framework's own
``eval_static_fidelity_gradient`` — its 1e-10 parity with the reference's
augmented-expm gradient is pinned separately (tests/test_propagate.py), so
what this artifact isolates is the *optimizer driver*: Fortran L-BFGS-B
line-search/subspace behavior vs our batched projected two-loop kernel.

Output: artifacts/scipy_lbfgs_dist.json
  {"<N>_<out>": {"fids": [...], "seed": s, "restarts": k,
                 "mean_nfev": ..., "scipy_version": ...}}

tests/test_models.py::test_lbfgs_outcome_distribution_matches_scipy
KS-compares a budget-matched batch of our kernel against this file,
replacing the old hardcoded-constant comment (VERDICT r2 weak #4).

Usage (repo root):  python artifacts/scipy_lbfgs_baseline.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np  # noqa: E402


def run_transition(n, out, restarts=512, seed=1234):
    import jax
    import jax.numpy as jnp
    import scipy
    import scipy.optimize
    from code_robchar_tpu.models import LBFGS
    from code_robchar_tpu.ops import realform

    opt = LBFGS(n, 0, out, testing=True)
    rng = np.random.default_rng(seed)
    lo = np.asarray([b[0] for b in opt.val_bounds])
    hi = np.asarray([b[1] for b in opt.val_bounds])
    x0s = lo + (hi - lo) * rng.uniform(size=(restarts, n + 1))

    hh = opt.HH
    grad_fn = jax.jit(lambda x: realform.infidelity_and_gradient_sym(
        hh, x, 0, out))

    def oracle(x):
        e, g = grad_fn(jnp.asarray(x))
        return float(e), np.asarray(g, dtype=float)

    fids = []
    nfevs = []
    t0 = time.time()
    for x0 in x0s:
        x, f, d = scipy.optimize.fmin_l_bfgs_b(
            oracle, x0, bounds=opt.val_bounds)
        fids.append(1.0 - float(f))
        nfevs.append(int(d["funcalls"]))
    print(f"[scipy-baseline] N={n} 0->{out}: {restarts} restarts in "
          f"{time.time() - t0:.0f}s, best {max(fids):.6f}, "
          f"mean nfev {np.mean(nfevs):.1f}")
    return {"fids": fids, "seed": seed, "restarts": restarts,
            "mean_nfev": float(np.mean(nfevs)),
            "scipy_version": scipy.__version__}


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    out = {}
    for n, o in ((4, 2), (5, 2)):
        out[f"{n}_{o}"] = run_transition(n, o)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scipy_lbfgs_dist.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("[scipy-baseline] wrote", path)


if __name__ == "__main__":
    main()
