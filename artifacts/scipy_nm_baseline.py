"""Frozen scipy Nelder-Mead outcome-distribution baseline (VERDICT r4
next #1a).

Generates, ONCE, the controller-fidelity distribution the reference's
noiseless NMPlus production path produces: multi-start
``scipy.optimize.minimize(method='Nelder-Mead', maxfev=300,
bounds=val_bounds)`` (nmplus.py:212-228) with uniform inits in the bound
box, on the N=4 0->2 and N=5 0->2 transitions.

Unlike the L-BFGS baseline (artifacts/scipy_lbfgs_baseline.py, which
reuses this framework's 1e-10-pinned gradient oracle), the objective
here is PURE numpy/scipy — XX-chain Hamiltonian + scipy expm fidelity
exactly as qnewton.py:383-400 — so the artifact is fully independent of
the repo's kernels: it freezes both the reference physics AND the
reference driver.

Output: artifacts/scipy_nm_dist.json
  {"<N>_<out>": {"fids": [...], "seed": s, "restarts": k, "maxfev": 300,
                 "mean_nfev": ..., "mean_nit": ..., "scipy_version": ...}}

tests/test_models.py::test_nmplus_outcome_distribution_matches_scipy
KS-compares a budget-matched batch of models/nmplus.py against this
file — the SURVEY §7.4 parity contract (budget-matched outcome
distributions) for the NM family.

Usage (repo root):  python artifacts/scipy_nm_baseline.py
"""

import json
import os
import time

import numpy as np


def make_objective(n, in_spin, out_spin):
    """Reference-style noiseless infidelity: 1 - |U[out,in]|^2 with
    U = expm(-1j*|x[n]|*(H0 + sum_l x[l] e_l e_l^T)) (qnewton.py:383-400,
    open XX chain: off-diagonal couplings 1, qnewton.py:140-147)."""
    import scipy.linalg

    h0 = np.zeros((n, n), dtype=complex)
    for l in range(1, n):
        h0[l - 1, l] = h0[l, l - 1] = 1.0

    def infidelity(x):
        h = h0 + np.diag(x[:n])
        u = scipy.linalg.expm(-1j * abs(x[n]) * h)
        phi = u[out_spin, in_spin]
        return 1.0 - (phi.real * phi.real + phi.imag * phi.imag)

    return infidelity


def run_transition(n, out, restarts=512, seed=1234, maxfev=300):
    import scipy
    import scipy.optimize

    infid = make_objective(n, 0, out)
    bounds = [(-10.0, 10.0)] * n + [(0.0, 30.0)]
    rng = np.random.default_rng(seed)
    lo = np.asarray([b[0] for b in bounds])
    hi = np.asarray([b[1] for b in bounds])
    x0s = lo + (hi - lo) * rng.uniform(size=(restarts, n + 1))

    fids, nfevs, nits = [], [], []
    t0 = time.time()
    for x0 in x0s:
        res = scipy.optimize.minimize(
            infid, x0=x0, options={"disp": False, "maxfev": maxfev},
            method="Nelder-Mead", bounds=bounds)
        fids.append(1.0 - float(res.fun))   # fi = 1 - x.fun (noiseless,
        nfevs.append(int(res.nfev))         # nmplus.py:231-234)
        nits.append(int(res.nit))
    print(f"[scipy-nm-baseline] N={n} 0->{out}: {restarts} restarts in "
          f"{time.time() - t0:.0f}s, best {max(fids):.6f}, "
          f"mean nfev {np.mean(nfevs):.1f}, mean nit {np.mean(nits):.1f}")
    return {"fids": fids, "seed": seed, "restarts": restarts,
            "maxfev": maxfev, "mean_nfev": float(np.mean(nfevs)),
            "mean_nit": float(np.mean(nits)),
            "scipy_version": scipy.__version__}


def main():
    out = {}
    for n, o in ((4, 2), (5, 2)):
        out[f"{n}_{o}"] = run_transition(n, o)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "scipy_nm_dist.json")
    with open(path, "w") as f:
        json.dump(out, f)
    print("[scipy-nm-baseline] wrote", path)


if __name__ == "__main__":
    main()
