"""Minimal(ish) repro hunt for the full-suite XLA-CPU segfault.

Background (VERDICT r2 weak #6 / next #8): a full serial pytest run
compiles ~10^2 distinct XLA CPU executables in one process and
reproducibly segfaulted during a LATE compile; the same test passes in
isolation, and per-module ``jax.clear_caches()`` (tests/conftest.py)
works around it.  This script reproduces the compile load pattern —
many distinct, large-ish unrolled programs (Jacobi rotation chains like
ops/realform.py emits) kept LIVE in the executable cache — using only
public jax, so a crash here pins the bug upstream of this repo.

Run:   python artifacts/xla_cpu_segfault_repro.py [n_programs=300]
It prints RSS every 25 programs; a segfault (exit -11) or a monotonic
RSS blow-up is the signal.  Findings are recorded in
docs/ROADMAP.md ("XLA-CPU segfault" entry).
"""

import os
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return int(line.split()[1]) // 1024
    return -1


def make_program(n, sweeps, extra):
    """A distinct unrolled rotation-chain program per (n, sweeps, extra):
    the same compile shape class as the lanes Jacobi kernels (hundreds of
    fused elementwise ops over a lanes axis)."""
    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]

    @jax.jit
    def f(a):  # a: (n, n, B)
        for _ in range(sweeps):
            for p, q in pairs:
                app, aqq, apq = a[p, p], a[q, q], a[p, q]
                tau = (aqq - app) / (2.0 * (jnp.abs(apq) + 1e-30))
                t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1 + tau * tau))
                c = 1.0 / jnp.sqrt(1 + t * t)
                s = t * c
                rp = c * a[:, p] - s * a[:, q]
                rq = s * a[:, p] + c * a[:, q]
                a = a.at[:, p].set(rp).at[:, q].set(rq)
        return jnp.sum(a * a) + extra
    return f


def main(n_programs=300):
    for i in range(n_programs):
        n = 3 + (i % 8)                 # 3..10 like the chain sizes
        sweeps = 2 + (i % 3)
        b = 16 + (i % 7) * 16           # distinct batch -> distinct cache
        f = make_program(n, sweeps, float(i))
        x = jnp.asarray(np.random.default_rng(i).normal(size=(n, n, b)))
        float(f(x))                     # compile + run, keep exe live
        if i % 25 == 0:
            print(f"[{i:4d}] n={n} sweeps={sweeps} b={b} "
                  f"RSS={rss_mb()} MB", flush=True)
    print(f"done: {n_programs} live executables, RSS={rss_mb()} MB — "
          "no crash")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 300)
