"""Roofline / absolute-utilization analysis for the headline kernels.

VERDICT r3 next #2: every prior perf claim is relative (vs scipy host
rate / vs the north-star wall-clock); this script pins the ABSOLUTE
achieved FLOP/s and HBM bytes/s of the three kernels that carry the
headline numbers, against TPU v5e peaks, and probes WHERE the gap to
the roof lives (dependency stalls vs per-op cost) with synthetic
same-shape ALU kernels.

Kernels:
  1. Hermitian Jacobi fidelity sweep (ops/pallas_jacobi.make_fidelity_
     kernel) — the MC characterisation engine (49M Hams/s headline).
  2. Fused symmetric gradient (make_sym_grad_kernel) — the optimizer
     zoo objective (74.4k L-BFGS restarts/s headline).
  3. Symmetric amplitude kernel (make_sym_amp_kernel) — the physics
     core of the fused PPO rollout (1.44M env-steps/s headline).

Method: for each kernel, wall-time at sweeps s in {1..max} and fit
time(s) = a + b*s; the slope isolates the rotation chain from fixed
costs (DMA, reconstruction, dispatch), giving cycles/rotation directly.
FLOP counts are static functions of (n, sweeps) — hand-counted from the
kernel bodies (see _*_flops below; each jnp op on a (tile,) row = one
VPU op per lane; sqrt/div/sign/transcendentals counted as ONE op, so
the reported utilization is a LOWER bound on hardware-op utilization).

v5e peaks used (public spec; the guide gives the shapes, not clocks):
  VPU: 8x128 lanes x 4 ALUs x ~1.74 GHz = 7.13e12 f32 op/s
  HBM: 819 GB/s;  MXU: 197 TFLOP/s bf16.

Usage (repo root, TPU): python artifacts/perf/roofline.py
Prints JSON lines; ROOFLINE.md holds the digested table.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

import numpy as np  # noqa: E402

VPU_PEAK = 8 * 128 * 4 * 1.74e9          # f32 elementwise op/s
HBM_PEAK = 819e9                          # bytes/s
CLOCK = 1.74e9

N, IN, OUT = 7, 0, 6
PAIRS = N * (N - 1) // 2


# ---------------------------------------------------------------------------
# static FLOP models (hand-counted from ops/pallas_jacobi.py bodies)
# ---------------------------------------------------------------------------

def herm_rot_flops(n):
    """_rotation_body: angle setup 34, per off-pivot row 26 (two complex
    half-rotations + mirror negates), pivot block 7, two carried complex
    V rows 24 each."""
    return 34 + 26 * (n - 2) + 7 + 48


def herm_recon_flops(n):
    return 14 * n + 3


def sym_rot_flops(n, vrows):
    """sym_sweeps_on_scratch: setup 27, per off-pivot row 6, pivot 6,
    per carried V row 6."""
    return 27 + 6 * (n - 2) + 6 + 6 * vrows


def herm_ham_flops(n, sweeps):
    return sweeps * (n * (n - 1) // 2) * herm_rot_flops(n) + \
        herm_recon_flops(n)


def amp_ham_flops(n, sweeps):
    return sweeps * (n * (n - 1) // 2) * sym_rot_flops(n, 2) + 6 * n + 2


def grad_eval_flops(n, sweeps):
    rot = sweeps * (n * (n - 1) // 2) * sym_rot_flops(n, n)
    recon = 7 * n + 4                      # fidelity
    gamma = 12 * n * n                     # Daleckii-Krein cache
    triple = n * n * (5 * n + 5) + 5 * n   # bias gradient
    tgrad = 6 * n                          # time gradient
    return rot + recon + gamma + triple + tgrad


def rollout_step_flops(n, h, sweeps):
    """pallas_rollout._step_math per agent-step: actor MLP (d->h->h->d,
    2 flops/MAC) + tanh(2x h) + physics (sym Jacobi, 2 carried rows) +
    amplitude + env bookkeeping (~30)."""
    d = n + 1
    mlp = 2 * (d * h + h * h + h * d) + 2 * h
    physics = sweeps * (n * (n - 1) // 2) * sym_rot_flops(n, 2) + \
        6 * n + 2
    return mlp + physics + 30


# ---------------------------------------------------------------------------
# timing
# ---------------------------------------------------------------------------

def fetch(x):
    import jax.numpy as jnp
    return float(jnp.sum(x if not isinstance(x, tuple) else x[0]))


def timeit(fn, reps=5):
    """median of `reps` fetch-barrier timings after two warm-ups (the
    relay charges variable per-dispatch latency; median rejects the
    stalls that poisoned the first-cut linear fits)."""
    fetch(fn())
    fetch(fn())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def amortize(kern_call, R):
    """One jitted program executing R distinct kernel launches — the
    ~10 ms relay dispatch overhead (measured as the intercept of the
    first-cut fits) is paid once per R, so per-launch times reflect
    device compute."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(*ops):
        acc = None
        for i in range(R):
            f = kern_call(i, *ops)
            f = f if not isinstance(f, tuple) else f[0]
            acc = jnp.sum(f) if acc is None else acc + jnp.sum(f)
        return acc
    return many


def sweep_fit(times_by_sweeps):
    """least-squares slope of time vs sweeps -> seconds per sweep."""
    s = np.array(sorted(times_by_sweeps))
    t = np.array([times_by_sweeps[k] for k in s])
    slope, icept = np.polyfit(s, t, 1)
    return float(slope), float(icept)


def main():
    import jax
    import jax.numpy as jnp
    from code_robchar_tpu.ops import pallas_jacobi as pj

    tiny = jax.jit(lambda a: a @ a)(jnp.ones((8, 8)))
    np.asarray(tiny)                       # relay handshake

    B = 1 << 19                            # 524k lanes per launch
    rng = np.random.default_rng(0)
    a = rng.normal(size=(B, N, N)).astype(np.float32)
    sym = (a + np.transpose(a, (0, 2, 1))) / 2
    ar = jnp.asarray(np.moveaxis(sym, 0, -1).reshape(N * N, B).copy())
    ai_ = rng.normal(size=(B, N, N)).astype(np.float32)
    skew = (ai_ - np.transpose(ai_, (0, 2, 1))) / 2
    ai = jnp.asarray(np.moveaxis(skew, 0, -1).reshape(N * N, B).copy())
    t = jnp.asarray(rng.uniform(1, 5, B).astype(np.float32))

    out = {}
    R = 8                                  # launches amortized per jit

    # ---- 1. Hermitian fidelity kernel ---------------------------------
    times = {}
    for s in (1, 2, 3, 4, 5, 6):
        k = pj.make_fidelity_kernel(N, IN, OUT, sweeps=s)
        many = amortize(
            lambda i, a_, b_, t_: k(a_, b_, (t_ + i * 1e-3).reshape(1, B)),
            R)
        times[s] = timeit(lambda m=many: m(ar, ai, t)) / R
    slope, icept = sweep_fit(times)
    rot_s = slope / PAIRS                  # seconds per rotation stage
    prod_s = 5                             # production sweep count, n=7
    wall5 = times[prod_s]
    flops = herm_ham_flops(N, prod_s)
    hbm_bytes = (2 * N * N + 1 + 1) * 4    # ar+ai in, t in, fid out
    out["herm_fidelity"] = {
        "wall_s_at_5_sweeps": wall5, "hams_per_s": B / wall5,
        "flops_per_ham": flops,
        "achieved_flops": B / wall5 * flops,
        "vpu_frac": B / wall5 * flops / VPU_PEAK,
        "achieved_hbm_Bps": B / wall5 * hbm_bytes,
        "hbm_frac": B / wall5 * hbm_bytes / HBM_PEAK,
        "cycles_per_rotation_per_1024": rot_s * CLOCK / (B / 1024),
        "flops_per_rotation": herm_rot_flops(N),
        "fit_slope_s_per_sweep": slope, "fit_intercept_s": icept,
        "times_by_sweeps": {str(k): v for k, v in times.items()},
    }
    print(json.dumps({"herm_fidelity": out["herm_fidelity"]}))

    # ---- 2. fused symmetric gradient kernel ----------------------------
    times = {}
    for s in (1, 2, 3, 4, 5, 6):
        k = pj.make_sym_grad_kernel(N, IN, OUT, sweeps=s)
        many = amortize(
            lambda i, a_, t_: k(a_, (t_ + i * 1e-3).reshape(1, B)), R)
        times[s] = timeit(lambda m=many: m(ar, t)) / R
    slope, icept = sweep_fit(times)
    wall5 = times[5]
    flops = grad_eval_flops(N, 5)
    hbm_bytes = (N * N + 1 + 1 + N + 1) * 4
    out["sym_gradient"] = {
        "wall_s_at_5_sweeps": wall5, "evals_per_s": B / wall5,
        "flops_per_eval": flops,
        "achieved_flops": B / wall5 * flops,
        "vpu_frac": B / wall5 * flops / VPU_PEAK,
        "achieved_hbm_Bps": B / wall5 * hbm_bytes,
        "hbm_frac": B / wall5 * hbm_bytes / HBM_PEAK,
        "cycles_per_rotation_per_1024": slope / PAIRS * CLOCK / (B / 1024),
        "flops_per_rotation": sym_rot_flops(N, N),
        "fit_slope_s_per_sweep": slope, "fit_intercept_s": icept,
    }
    print(json.dumps({"sym_gradient": out["sym_gradient"]}))

    # ---- 3. symmetric amplitude kernel (rollout physics core) ----------
    times = {}
    for s in (1, 2, 3, 4, 5, 6):
        k = pj.make_sym_amp_kernel(N, IN, OUT, sweeps=s)
        many = amortize(
            lambda i, a_, t_: k(a_, (t_ + i * 1e-3).reshape(1, B)), R)
        times[s] = timeit(lambda m=many: m(ar, t)) / R
    slope, icept = sweep_fit(times)
    wall5 = times[5]
    flops = amp_ham_flops(N, 5)
    out["sym_amplitude"] = {
        "wall_s_at_5_sweeps": wall5, "hams_per_s": B / wall5,
        "flops_per_ham": flops,
        "achieved_flops": B / wall5 * flops,
        "vpu_frac": B / wall5 * flops / VPU_PEAK,
        "cycles_per_rotation_per_1024": slope / PAIRS * CLOCK / (B / 1024),
        "flops_per_rotation": sym_rot_flops(N, 2),
        "fit_slope_s_per_sweep": slope, "fit_intercept_s": icept,
    }
    print(json.dumps({"sym_amplitude": out["sym_amplitude"]}))

    # ---- 4. synthetic ALU probes: dependency stalls vs op cost ---------
    # Same memory shape as the Jacobi kernels ((nn, tile) VMEM scratch,
    # ops on (tile,) rows).  serial: one K-long dependent mul-add chain.
    # ilp4: four independent K/4 chains (the instruction-level
    # parallelism a round-robin parallel-pivot ordering would expose).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = pj.DEFAULT_TILE

    def make_probe(streams, K):
        def kernel(x_in, y_out, scr):
            scr[:, :] = x_in[:, :]
            xs = [scr[i, :] for i in range(streams)]
            m = scr[streams, :]
            c = scr[streams + 1, :]
            for _ in range(K // streams):
                xs = [x * m + c for x in xs]
            acc = xs[0]
            for x in xs[1:]:
                acc = acc + x
            y_out[0, :] = acc

        @jax.jit
        def run(x):
            b = x.shape[-1]
            return pl.pallas_call(
                kernel, grid=(b // tile,),
                in_specs=[pl.BlockSpec((N * N, tile), lambda i: (0, i))],
                out_specs=pl.BlockSpec((1, tile), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((1, b), x.dtype),
                scratch_shapes=[pltpu.VMEM((N * N, tile), x.dtype)],
            )(x)
        return run

    # marginal cost per chain op via a K-sweep (same isolation as the
    # kernels' sweeps-fit: intercept absorbs the per-launch fixed cost)
    probe = {}
    xprobe = ar * 1e-3
    for streams in (1, 4, 8):
        times_k = {}
        for K in (1024, 2048, 4096):
            run = make_probe(streams, K)
            many = amortize(lambda i, x_: run(x_ + i * 1e-6), R)
            times_k[K] = timeit(lambda m=many: m(xprobe)) / R
        ks = np.array(sorted(times_k))
        ts = np.array([times_k[k] for k in ks])
        slope = float(np.polyfit(ks, ts, 1)[0])   # s per chain step
        probe[streams] = {
            "times_by_K": {str(k): times_k[k] for k in ks},
            "marginal_cycles_per_fma_per_1024": slope * CLOCK / (B / 1024),
            "marginal_cycles_per_op_per_1024":
                slope * CLOCK / (B / 1024) / 2,
        }
        print(json.dumps({f"alu_probe_{streams}_streams": probe[streams]}))
    out["alu_probe"] = probe

    # ---- 5. attribution: full MC metric sweep vs raw kernel ------------
    from code_robchar_tpu.mc.engine import mc_metric_sweep
    from code_robchar_tpu.ops import chain
    h0 = chain.xx_hamiltonian_real(N, dtype=jnp.float32)
    ctrl = jax.random.uniform(jax.random.key(3), (10000, N + 1),
                              jnp.float32, -10, 10)
    noises = jnp.linspace(0, 0.1, 11).astype(jnp.float32)
    g = lambda k: mc_metric_sweep(      # noqa: E731
        h0, ctrl, noises, k, 100, 0, OUT,
        use_pallas=True)[r"$W(.,\delta(x-1))$"]
    fetch(g(jax.random.key(0)))
    dt_full = timeit(lambda: g(jax.random.key(2)))
    lattice = 11 * 10000 * 100
    kern_only = out["herm_fidelity"]["wall_s_at_5_sweeps"] * (lattice / B)
    out["mc_attribution"] = {
        "full_sweep_wall_s": dt_full,
        "hams_per_s": lattice / dt_full,
        "raw_kernel_equiv_wall_s": kern_only,
        "kernel_fraction": kern_only / dt_full,
    }
    print(json.dumps({"mc_attribution": out["mc_attribution"]}))

    # ---- 6. fused rollout: rollout-only epoch (0 update iters) ---------
    # The bench's env-steps/s divides by the WHOLE epoch (incl. the pi/v
    # update loops); a train_pi_iters=train_v_iters=0 epoch isolates the
    # rollout kernel + trajectory postprocessing.
    from code_robchar_tpu.models.ppo import PPO_en
    agents, T = 1024, 500
    ppo = PPO_en(N, 0, OUT, testing=True, fid_threshold=0.0,
                 ham_noisy=True, noise=0.05, repeats=10**9,
                 run_until_told_to_stop=True,
                 run_until_completion_its=10**12,
                 landscape_exploration=True, save_topc=100,
                 num_agents=agents)
    st = jax.vmap(ppo._init_agent)(
        jax.random.split(jax.random.key(1), agents))

    def epoch_rate(pi_iters, v_iters):
        fn = ppo._build_epoch(T, 0.2, 3e-3, 1e-3, 1000, pi_iters,
                              v_iters, 0.01)
        s = st
        for _ in range(3):    # compile + the relay's one-time
            s, _ = fn(s)      # second-execution stall absorber
            fetch(s.obs)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            s, _ = fn(s)
            fetch(s.obs)
            ts.append(time.perf_counter() - t0)
        return agents * T / float(np.median(ts))

    roll_rate = epoch_rate(0, 0)
    full_rate = epoch_rate(200, 200)
    fl_step = rollout_step_flops(N, 100, 5)
    out["rollout"] = {
        "rollout_only_env_steps_per_s": roll_rate,
        "full_epoch_env_steps_per_s": full_rate,
        "update_loop_fraction_of_epoch": 1 - full_rate / roll_rate,
        "flops_per_step": fl_step,
        "rollout_achieved_flops": roll_rate * fl_step,
        "rollout_vpu_frac": roll_rate * fl_step / VPU_PEAK,
    }
    print(json.dumps({"rollout": out["rollout"]}))

    with open(os.path.join("artifacts", "perf", "roofline_results.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("wrote artifacts/perf/roofline_results.json")


if __name__ == "__main__":
    main()
