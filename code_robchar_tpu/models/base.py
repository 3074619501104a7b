"""Shared scaffolding for the optimizer zoo.

Constructor contract and run()/record protocol follow the reference's LBFGS
base class (qnewton.py:26-120, README.md:20): same keyword surface, same
``record``/``records`` dict keys, same stop modes (first-hit fid_threshold
vs run-until-fcall-budget with landscape-exploration top-c collection), same
wall-clock timeout behavior (AssertionError), same function-call accounting
multipliers.

TPU-native difference: restarts are executed in *device batches* — each
optimizer implements `_run_batch(x0s, keys) -> BatchResult` as one jitted
vmapped program, and the host loop here only does record bookkeeping between
batches.  Batch size auto-scales so that fcall-budget checkpoints
(records_update_rate) keep their resolution.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Dict, NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from code_robchar_tpu.models import objectives
from code_robchar_tpu.ops import chain, noise as noise_ops, realform, sobol
from code_robchar_tpu.utils.record import RunRecord, TopControllers
from code_robchar_tpu.utils.timeout import Deadline

from functools import partial


# Jitted kernels behind the scalar host conveniences (fidelity_ss and
# friends).  These MUST be jitted, not eager: on this jaxlib each eager
# primitive dispatch loads fresh XLA:CPU AOT modules that are never
# released (~8 MB/eval measured), so a host-side optimizer driving the
# scalar objective thousands of times (the SNOBFIT adapter's 300-eval
# restarts) exhausts memory and segfaults LLVM.  jit caches one
# executable per (shape, dtype) and holds memory flat.  Noise level and
# PRNG key are operands, not closure constants, so one compile serves
# every sigma cell (the Experiment driver mutates .noise between runs).

@partial(jax.jit, static_argnames=("in_spin", "out_spin"))
def _fid_clean_jit(h, x, in_spin, out_spin):
    return realform.fidelity_from_controller_sym(h, x, in_spin, out_spin)


@partial(jax.jit, static_argnames=("in_spin", "out_spin"))
def _fid_hamnoisy_jit(h, x, key, sigma, in_spin, out_spin):
    zr, _ = noise_ops.structured_perturbation_parts(
        key, h.shape[-1], sigma, complex_offdiag=False, dtype=h.dtype)
    return realform.fidelity_from_controller_sym(h + zr, x, in_spin,
                                                 out_spin)


@partial(jax.jit, static_argnames=("in_spin", "out_spin"))
def _fid_av_jit(hams, x, in_spin, out_spin):
    return jnp.mean(jax.vmap(
        lambda h: realform.fidelity_from_controller_sym(
            h, x, in_spin, out_spin))(hams))


@partial(jax.jit, static_argnames=("in_spin", "out_spin"))
def _infid_grad_jit(h, x, in_spin, out_spin):
    return realform.infidelity_and_gradient_sym(h, x, in_spin, out_spin)


_shot_jit = jax.jit(noise_ops.shot_noise_fidelity)
_adaptive_jit = jax.jit(noise_ops.adaptive_shot_fidelity)


#: Compiled batch programs shared across optimizer INSTANCES.  The
#: Experiment driver constructs a fresh model per (family, noise) cell
#: (noise_analysis.py:337-344 — mirrored in exp/experiment.py), and jit's
#: executable cache is per-closure, so without this every cell would pay a
#: full XLA compile (~26 s on the TPU relay) for ~0.2 s of compute.  The
#: noise LEVEL and the fixed-ham ensemble are runtime operands of the
#: cached programs (ObjectiveSpec is built inside the trace), so one
#: compile per family serves every sigma cell.
_PROGRAM_CACHE: "OrderedDict[tuple, Callable]" = OrderedDict()
_PROGRAM_CACHE_MAX = 64


def cached_program(key: tuple, builder: Callable[[], Callable]) -> Callable:
    fn = _PROGRAM_CACHE.get(key)
    if fn is None:
        fn = builder()
        _PROGRAM_CACHE[key] = fn
        while len(_PROGRAM_CACHE) > _PROGRAM_CACHE_MAX:
            _PROGRAM_CACHE.popitem(last=False)
    else:
        _PROGRAM_CACHE.move_to_end(key)
    return fn


class BatchResult(NamedTuple):
    """Per-restart outputs of one device batch."""
    x: jnp.ndarray          # (K, d) final controllers
    fid: jnp.ndarray        # (K,) fidelity under the training objective
    true_fid: jnp.ndarray   # (K,) noiseless fidelity
    nfev: jnp.ndarray       # (K,) objective calls (incl. multipliers)
    nit: jnp.ndarray        # (K,) iterations
    #: optional dense top-c candidates collected INSIDE the device program
    #: (per-iteration incumbents, qnewton.py:604-616/743-757 offer every
    #: iteration — segment-final x alone under-fills the .le store)
    cand_x: Optional[jnp.ndarray] = None     # (K, kc, d)
    cand_fid: Optional[jnp.ndarray] = None   # (K, kc)


class ControlOptimizer:
    """Base class; subclasses implement `_run_batch` and set `name`."""

    name = "base"
    #: default restarts executed per device dispatch
    default_batch = 128
    #: only LBFGS wires the Wasserstein training cost (qnewton.py:512);
    #: everywhere else the flag must fail loudly instead of silently
    #: training a different objective than asked
    supports_wass_cost = False
    #: True for optimizers whose "batch" is a persistent stream set (Adam)
    #: rather than independent restarts — the run loop must never shrink
    #: or reshape their batch between dispatches
    persistent_streams = False

    def __init__(self, nspin, in_spin, out_spin, bmin=-10, bmax=10,
                 max_time=30, repeats=1000000, fid_threshold=0.98, log=False,
                 topo="linear", save=False, noisy=False, timeout=1800000,
                 fid_noisy=False, draws=10, ham_noisy=False, verbose=False,
                 adp_tol=0.05, adaptive=False, noise=0.05,
                 use_wass_cost=False, testing=None,
                 run_until_told_to_stop=None, run_until_completion_its=None,
                 landscape_exploration: bool = False, save_topc: int = 1000,
                 heisenberg_int: bool = False, use_fixed_ham: bool = False,
                 opt_train_size: int = 100,
                 records_update_rate: Optional[float] = None,
                 seed: Optional[int] = None,
                 restart_batch: Optional[int] = None,
                 mesh=None):
        self.Nspin = nspin
        self.In = in_spin
        self.Out = out_spin
        self.topo = "ring" if topo == "ring" else "chain"
        self.heisenberg_int = heisenberg_int
        self.Tmin, self.Tmax = 0.0, float(max_time)
        self.Bmin, self.Bmax = float(bmin), float(bmax)
        self.repeats = int(repeats)
        self.fid_threshold = fid_threshold
        self.draws = draws
        self.fid_noisy = fid_noisy
        self.ham_noisy = ham_noisy
        self.adaptive = adaptive
        self.adp_tol = adp_tol
        self.noise = noise
        self.timeout = timeout
        self.verbose = verbose
        self.save = save
        self.testing = testing
        if use_wass_cost and not self.supports_wass_cost:
            raise NotImplementedError(
                f"{type(self).__name__} does not implement the Wasserstein "
                "training cost; only LBFGS wires use_wass_cost "
                "(qnewton.py:512)")
        self.use_wass_cost = use_wass_cost
        self.run_until_told_to_stop = run_until_told_to_stop
        self.run_until_completion_its = run_until_completion_its
        self.landscape_exploration = landscape_exploration
        self.save_topc = save_topc
        self.use_fixed_ham = use_fixed_ham
        self.train_size = opt_train_size
        self.records_update_rate = records_update_rate
        self.fun_call_limit = 1e10
        self.restart_batch = restart_batch
        #: optional jax.sharding.Mesh: restart/stream batches are laid out
        #: with their batch axis split over the mesh and dispatched through
        #: shard_map-wrapped copies of the SAME batch programs (SURVEY §2.4
        #: — restarts are embarrassingly parallel, so the manual programs
        #: are collective-free along the batch axis; manual axes are
        #: required because Pallas/Mosaic kernels cannot be
        #: GSPMD-auto-partitioned).  First-class multi-chip surface for
        #: the whole zoo (VERDICT r2 next #1).
        self.mesh = mesh

        assert self.Tmax >= self.Tmin and self.Bmax >= self.Bmin

        # the drift is REAL symmetric; no complex array is ever created on
        # the production path (TPU backends lack complex support — see
        # ops/realform.py).
        self.HH = chain.xx_hamiltonian_real(nspin, topo=self.topo,
                                            heisenberg=heisenberg_int)
        self.val_bounds = [(self.Bmin, self.Bmax)] * nspin + \
            [(self.Tmin, self.Tmax)]
        self._lower = jnp.asarray([b[0] for b in self.val_bounds])
        self._upper = jnp.asarray([b[1] for b in self.val_bounds])

        if seed is None:
            seed = 0 if testing else int(np.random.randint(0, 2**31 - 1))
        self._key = jax.random.key(seed)
        self.seed = seed

        # fixed-Hamiltonian ensemble (documented seed contract: key(4),
        # mirroring the reference's np.random.seed(4), qnewton.py:124)
        if use_fixed_ham:
            self.randH, self.randH_test = noise_ops.fixed_hamiltonian_ensemble(
                jax.random.key(4), self.HH, self.noise,
                train_size=self.train_size, test_size=10000)
        else:
            self.randH = self.randH_test = None

        self.record: Dict = {"time_to_get_fid": None, "func_calls": None,
                             "iterations": None, "repeats": None,
                             "best_fid": None, "controller": None}
        self.records: Dict = {}
        self.filename = self.filename_generator()

    # ----------------------------------------------------------- plumbing

    def filename_generator(self) -> str:
        return "{}_record_s{}_o{}_t{}_b{}_r_{}.json".format(
            self.name, self.Nspin, self.Out, self.Tmax, self.Bmax,
            self.repeats)

    def next_key(self) -> jax.Array:
        self._key, k = jax.random.split(self._key)
        return k

    def spec(self) -> objectives.ObjectiveSpec:
        """The device objective spec for the *current* noise config.

        Rebuilt on each run() because Experiment mutates .noise and
        .fid_threshold after construction (noise_analysis.py:340-344).
        """
        return objectives.ObjectiveSpec(
            h0=self.HH, in_spin=self.In, out_spin=self.Out,
            noise=float(self.noise), fid_noisy=bool(self.fid_noisy),
            ham_noisy=bool(self.ham_noisy), draws=int(self.draws),
            adaptive=bool(self.adaptive), adp_tol=float(self.adp_tol),
            fixed_hams=self.randH if self.use_fixed_ham else None,
            mul_fac=self.train_size if self.use_fixed_ham else 1)

    def _traced_spec_fn(self):
        """Returns `make_spec(noise, fixed=None) -> ObjectiveSpec` with the
        noise level (and the fixed-ham ensemble) as TRACED operands — built
        inside the jitted batch programs so one compile serves every sigma
        (structured_perturbation already accepts a traced scale).

        A closure factory rather than a bound method so the batch-program
        builders capture ONLY these plain values: a cached program must not
        pin its first builder INSTANCE (and with it multi-MB fixed-ham
        ensembles) alive in `_PROGRAM_CACHE` for the process lifetime.
        Everything captured here is part of `_objective_statics`, so sharing
        the closure across instances via `cached_program` is sound."""
        h0, in_spin, out_spin = self.HH, self.In, self.Out
        fid_noisy, ham_noisy = bool(self.fid_noisy), bool(self.ham_noisy)
        draws, adaptive = int(self.draws), bool(self.adaptive)
        adp_tol = float(self.adp_tol)
        mul_fac = self.train_size if self.use_fixed_ham else 1

        def make_spec(noise, fixed=None):
            return objectives.ObjectiveSpec(
                h0=h0, in_spin=in_spin, out_spin=out_spin, noise=noise,
                fid_noisy=fid_noisy, ham_noisy=ham_noisy, draws=draws,
                adaptive=adaptive, adp_tol=adp_tol, fixed_hams=fixed,
                mul_fac=mul_fac)
        return make_spec

    def _objective_statics(self) -> tuple:
        """Every instance attribute the batch-program builders read that is
        NOT a runtime operand.  Two instances with equal statics share one
        compiled program (see _PROGRAM_CACHE)."""
        return (self.Nspin, self.In, self.Out, self.topo,
                bool(self.heisenberg_int), self.Bmin, self.Bmax,
                self.Tmin, self.Tmax, str(self.HH.dtype),
                bool(self.fid_noisy), bool(self.ham_noisy),
                bool(self.adaptive), int(self.draws), float(self.adp_tol),
                bool(self.use_fixed_ham),
                int(self.train_size) if self.use_fixed_ham else 0,
                bool(self.use_wass_cost))

    def _noise_operand(self) -> jnp.ndarray:
        return jnp.asarray(float(self.noise), self.HH.dtype)

    # ------------------------------------------------- reference-API shims

    def sys_hamiltonian(self):
        return self.HH

    def controls(self):
        return chain.control_projectors(self.Nspin, dtype=self.HH.dtype)

    @staticmethod
    def whole_sphere_sampling(size, dim):
        """Box-Muller whole-ball sampling (qnewton.py:325-338)."""
        nrvs = np.random.normal(0, 1, size=(size, dim))
        l2 = np.sqrt(np.sum(nrvs * nrvs, axis=1))
        r = np.random.random(size=size) / dim / l2
        return r[:, None] * nrvs

    def directional_perturbation(self):
        """Single-Hermitian-pair perturbation (qnewton.py:340-364)."""
        return noise_ops.directional_perturbation(
            self.next_key(), self.Nspin, self.noise)

    def find_min_fid_index(self, controller_list):
        """Index of the minimum-fidelity controller (qnewton.py:457-462),
        one vmapped batch instead of a map loop."""
        xs = jnp.asarray(np.asarray(controller_list, dtype=float))
        fids = jax.vmap(lambda x: realform.fidelity_from_controller_sym(
            self.HH, x, self.In, self.Out))(xs)
        return int(jnp.argmin(fids))

    def ngd(self, funcalls: int, lr: float = 1e-2):
        """RMSprop-flavoured noisy gradient descent — capability parity
        with the reference's experimental torch path (qnewton.py:226-253,
        unused by the pipeline) on the exact analytic gradient with a
        fresh ham perturbation per step, via optax."""
        import optax
        tx = optax.rmsprop(lr)
        w = jnp.asarray(self.init_points(1)[0])
        state = tx.init(w)
        spec = self.spec()

        def step(carry, key):
            w, state = carry
            zr, _ = noise_ops.structured_perturbation_parts(
                key, self.Nspin, spec.noise, complex_offdiag=False,
                dtype=self.HH.dtype)
            err, grad = realform.infidelity_and_gradient_sym(
                self.HH + zr, w, self.In, self.Out)
            updates, state = tx.update(grad, state)
            w = optax.apply_updates(w, updates)
            return (w, state), err

        keys = jax.random.split(self.next_key(), funcalls)
        (w, _), errs = jax.lax.scan(step, (w, state), keys)
        return np.asarray(w), 1.0 - float(jnp.min(errs))

    def structured_perturabation(self):  # reference spelling kept
        zr, _ = noise_ops.structured_perturbation_parts(
            self.next_key(), self.Nspin, self.noise, complex_offdiag=False,
            dtype=self.HH.dtype)
        return zr

    def fidelity_ss(self, x, noisy=False, ham_noisy=False,
                    use_fixed_ham=False, rH=None):
        """Host convenience mirroring qnewton.py:383-423.

        Routed through cached jitted kernels (module top) — eager
        evaluation leaks XLA:CPU AOT modules per call on this jaxlib,
        which OOMs host-side sequential drivers like the SNOBFIT
        adapter (round-5 finding; see the kernel comment above)."""
        x = jnp.asarray(np.asarray(x, dtype=float), self.HH.dtype)
        h = jnp.real(jnp.asarray(rH)).astype(self.HH.dtype) \
            if use_fixed_ham and rH is not None else self.HH
        if ham_noisy:
            fid = _fid_hamnoisy_jit(h, x, self.next_key(),
                                    jnp.asarray(self.noise, h.dtype),
                                    in_spin=self.In, out_spin=self.Out)
        else:
            fid = _fid_clean_jit(h, x, in_spin=self.In, out_spin=self.Out)
        if not noisy:
            return float(fid)
        if not self.adaptive:
            return float(_shot_jit(self.next_key(), fid, self.draws))
        est, _ = _adaptive_jit(self.next_key(), fid, self.draws,
                               self.adp_tol)
        return float(est)

    def fidelity_ss_av(self, x, test=False):
        hams = self.randH_test if test else self.randH
        return float(_fid_av_jit(
            hams, jnp.asarray(np.asarray(x, dtype=float), hams.dtype),
            in_spin=self.In, out_spin=self.Out))

    def eval_static_fidelity_gradient(self, x):
        err, grad = _infid_grad_jit(
            self.HH, jnp.asarray(np.asarray(x, dtype=float), self.HH.dtype),
            in_spin=self.In, out_spin=self.Out)
        return float(err), np.asarray(grad)

    def overlap_ss(self, x):
        """Steady-state overlap (qnewton.py:214-224) on the real drift:
        sum_k |V[in,k]|^2 |V[out,k]|^2."""
        x = jnp.asarray(x)
        h = self.HH + jnp.eye(self.Nspin, dtype=self.HH.dtype) * \
            x[:self.Nspin]
        _, v = realform.jacobi_eigh_sym(h)
        return float(jnp.sum((v[self.In, :] ** 2) * (v[self.Out, :] ** 2)))

    def wass_cost(self, x, bootstrap_reps=5):
        cost = objectives.make_wass_cost(self.spec(), bootstrap_reps)
        return float(cost(jnp.asarray(x), self.next_key()))

    def randHset_constructor(self, train_size=1000, test_size=10000):
        return noise_ops.fixed_hamiltonian_ensemble(
            jax.random.key(4), self.HH, self.noise,
            train_size=train_size, test_size=test_size)

    # --------------------------------------------------------- init points

    def init_points(self, k: int) -> np.ndarray:
        """k starting controllers in bounds: Sobol sequence under landscape
        exploration (qnewton.py:474,483-489), uniform otherwise."""
        if self.landscape_exploration:
            u = self._sobol_stream(k)
        else:
            u = np.asarray(jax.random.uniform(
                self.next_key(), (k, self.Nspin + 1)))
        lo = np.asarray(self._lower)
        hi = np.asarray(self._upper)
        return lo + (hi - lo) * u

    def _sobol_stream(self, k: int) -> np.ndarray:
        if not hasattr(self, "_sobol"):
            self._sobol = sobol.SobolStream(self.Nspin + 1)
        return self._sobol.next(k)

    # -------------------------------------------------------- the run loop

    def _run_batch(self, x0s: jnp.ndarray, keys: jax.Array) -> BatchResult:
        raise NotImplementedError

    def _program_key(self) -> tuple:
        """Family-specific `_PROGRAM_CACHE` key of the batched restart
        program (stateless-batch optimizers only)."""
        raise NotImplementedError

    def _run_batch_sharded(self, x0s: jnp.ndarray,
                           keys: jax.Array) -> BatchResult:
        """`_run_batch` with the restart axis split over ``self.mesh``.

        One shard_map program per (family statics, mesh), shared across
        instances and sigma cells exactly like the plain programs — see
        parallel.mesh.build_sharded_batch_fn for why manual axes are
        required (Pallas/Mosaic kernels cannot be GSPMD-auto-partitioned)
        and for the determinism contract.  Persistent-stream optimizers
        (Adam) manage their own sharding inside `_run_batch`."""
        if self.persistent_streams:
            return self._run_batch(x0s, keys)
        from code_robchar_tpu.parallel import mesh as pmesh
        fn = cached_program(
            self._program_key() + ("sharded", self.mesh),
            lambda: pmesh.build_sharded_batch_fn(self.mesh, self))
        if self.use_fixed_ham:
            return fn(x0s, keys, self._noise_operand(), self.randH)
        return fn(x0s, keys, self._noise_operand())

    def _batch_size(self) -> int:
        if self.restart_batch:
            return self.restart_batch
        k = self.default_batch
        if not self.run_until_told_to_stop:
            # threshold mode stops at the first restart over
            # fid_threshold, and record["func_calls"] bills the whole
            # dispatched batch — keep the reference-parity overshoot at
            # the base granularity instead of the (lane-recycled)
            # budget-mode pool size
            k = min(k, ControlOptimizer.default_batch)
        if self.run_until_told_to_stop and self.records_update_rate:
            # keep ~checkpoint resolution: a batch should not blow past one
            # records_update_rate window in a single dispatch
            per_restart = getattr(self, "budget_per_restart", 300)
            mul = self.train_size if self.use_fixed_ham else 1
            k = max(1, min(k, int(self.records_update_rate /
                                  max(per_restart * mul, 1))))
        return k

    def run(self):
        """The reference's run() contract (qnewton.py:464-632), batched."""
        from code_robchar_tpu import config
        config.absorb_relay_handshake()   # overlaps the first compile
        deadline = Deadline(self.timeout)
        top = TopControllers(self.save_topc)
        rr = RunRecord(landscape_exploration=self.landscape_exploration,
                       records_update_rate=self.records_update_rate,
                       run_until_completion_its=self.run_until_completion_its)
        self.record = rr.record
        self.records = rr.records

        funccalls = 0
        iters = 0
        reps_done = 0
        batch = self._batch_size()
        x0s_first = None   # persistent streams: init draws consumed once

        n_dev = self.mesh.devices.size if self.mesh is not None else 1

        # static (data-INdependent) cap on the batch shape from the fcall
        # budget and the nominal per-restart cost: every dispatch of this
        # run — and of every other sigma cell at the same budget — then
        # shares ONE shape, hence one XLA compile.
        budget_cap = batch
        if self.run_until_told_to_stop and self.run_until_completion_its \
                and not self.persistent_streams:
            est0 = float(getattr(self, "budget_per_restart", 300)) * \
                (self.train_size if self.use_fixed_ham else 1)
            budget_cap = max(1, int(np.ceil(
                float(self.run_until_completion_its) / est0)))

        while reps_done < self.repeats:
            # the SCHEDULED batch: a deterministic shape sequence, so one
            # XLA compile serves the whole run (and, through
            # _PROGRAM_CACHE + the persistent cache, every later cell)
            k_sched = min(batch, self.repeats - reps_done, budget_cap)
            k = k_sched
            # budget-aware final-batch shrink (VERDICT r2 weak #3): the
            # reference checks the fcall budget per restart
            # (qnewton.py:595-625); a full device batch past the budget
            # would overshoot by batch * per-restart-evals.  Estimate the
            # per-restart cost from billing observed so far (exact for
            # flat-billed SNOB/NM) and BILL only what the remaining budget
            # can pay for.  Crucially the shrink does NOT change the
            # dispatch shape: a data-dependent final-batch size would pay
            # a fresh ~20 s XLA compile for a ~0.2 s dispatch (measured on
            # the TPU relay).  Instead the batch is PADDED back to the
            # scheduled shape and the surplus lanes' results/billing are
            # sliced off below — restart i's result is bit-identical
            # either way (split(key, n)[:k] == split(key, k), and lane
            # recycling is restart-for-restart invariant to pool mates).
            if self.run_until_told_to_stop and self.run_until_completion_its \
                    and not self.persistent_streams:
                est = float(getattr(self, "budget_per_restart", 300)) * \
                    (self.train_size if self.use_fixed_ham else 1)
                if reps_done:
                    est = max(1.0, funccalls / reps_done)
                remaining = float(self.run_until_completion_its) - funccalls
                k = min(k, max(1, int(np.ceil(remaining / est))))
            # mesh dispatch needs the shape to be a multiple of the device
            # count; round DOWN (never exceed repeats/budget) and run any
            # final sub-mesh remainder unsharded.
            shard_this = self.mesh is not None and k_sched >= n_dev
            if shard_this:
                k_sched = (k_sched // n_dev) * n_dev
                k = min(k, k_sched)
            if self.persistent_streams and x0s_first is not None \
                    and len(x0s_first) == k:
                # persistent streams (Adam) ignore x0s after their first
                # segment (w/m/v carry across dispatches) — re-drawing
                # here would consume k Sobol draws per segment and break
                # the restart table's plain-continuation contract.  The
                # reference's Adam draws from ONE sampler sequence: the
                # initial point, then restart candidates only
                # (qnewton.py:659-700).
                x0s = x0s_first
            else:
                x0s = self.init_points(k)
                x0s_first = x0s
            if k < k_sched:
                # pad with copies of the last real start: the Sobol/uniform
                # stream advances by exactly k (reference parity), and the
                # pad lanes' outputs are discarded
                x0s = np.concatenate(
                    [x0s, np.repeat(x0s[-1:], k_sched - k, axis=0)])
            x0s = jnp.asarray(x0s)
            keys = jax.random.split(self.next_key(), k_sched)
            if shard_this:
                from code_robchar_tpu.parallel import mesh as pmesh
                x0s = pmesh.shard_batch(self.mesh, x0s)
                keys = pmesh.shard_batch(self.mesh, keys)
                res = self._run_batch_sharded(x0s, keys)
            else:
                res = self._run_batch(x0s, keys)

            xs = np.asarray(res.x)[:k]
            fids = np.asarray(res.fid)[:k]
            true_fids = np.asarray(res.true_fid)[:k]
            funccalls += int(np.asarray(res.nfev)[:k].sum())
            iters += int(np.asarray(res.nit)[:k].sum())
            reps_done += k

            if self.verbose:
                print(f"max_fid: {fids.max():.6f}, true fid: "
                      f"{true_fids[fids.argmax()]:.6f}, fcalls: {funccalls}")

            noisy_run = self.ham_noisy or self.fid_noisy

            if not self.run_until_told_to_stop:
                hit = np.nonzero(fids > self.fid_threshold)[0]
                if hit.size:
                    i = int(hit[np.argmax(fids[hit])])
                    rr.save(func_calls=funccalls, iterations=iters,
                            repeats=reps_done, controller=xs[i].tolist(),
                            best_fid=float(true_fids[i] if noisy_run
                                           else fids[i]), top=None)
                    if self.save:
                        self.save_record()
                    return float(fids[i])
            else:
                if self.landscape_exploration:
                    top.offer_many(fids, xs)
                    if res.cand_fid is not None:
                        cf = np.asarray(res.cand_fid)[:k].reshape(-1)
                        cx = np.asarray(res.cand_x)[:k].reshape(cf.size, -1)
                        top.offer_many(cf, cx)
                i = int(fids.argmax())
                prev = rr.record["best_fid"]
                crit = (fids[i] >= self.fid_threshold if prev is None
                        else (True if self.landscape_exploration
                              else fids[i] >= prev))
                if crit:
                    rr.save(func_calls=funccalls, iterations=iters,
                            repeats=reps_done, controller=xs[i].tolist(),
                            best_fid=float(true_fids[i] if noisy_run
                                           else fids[i]), top=top)
                if funccalls + 1 >= (self.run_until_completion_its or
                                     np.inf):
                    return rr.record["best_fid"]

            deadline.check(self.filename)
            if funccalls > self.fun_call_limit:
                print(f"fun ceiling exceeded {self.fun_call_limit}")
                return None
        return rr.record["best_fid"]

    # --------------------------------------------------------- persistence

    def save_record(self):
        from code_robchar_tpu.utils import io
        io.dump_json(self.record, self.filename)

    def read_record(self):
        from code_robchar_tpu.utils import io
        return io.load_json(self.filename)
