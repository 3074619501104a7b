"""SNOB: budget-matched stable-noise global search (SNOBFIT-class).

Reference: the SNOB subclass (qnewton.py:770-928) delegates to
skquant/SQSnobFit's SNOBFIT — branch-and-fit: a mix of local quadratic-model
exploitation points and global exploration points, 300-eval budget per
restart with optset(maxmp=150, maxfail=100).

No SNOBFIT implementation exists for JAX, and SURVEY.md §7.4 sanctions "a
faithful surrogate with identical fcall/record semantics".  This stand-in
keeps SNOBFIT's defining structure — each round proposes a *mixed batch* of
(a) local points from a quadratic model of the incumbent neighbourhood and
(b) space-filling exploration points — with exactly matched budget
accounting (300 objective evals per restart, billed x train_size under
fixed-ham, qnewton.py:862-866):

  round r: evaluate q candidates =
    - 2 "class-1/2" points: minimiser of a diagonal quadratic model fitted
      by symmetric differences around the incumbent (trust-radius-clipped),
    - q/2 - 1 "class-3" points: Gaussian jitter around the incumbent with a
      radius that shrinks on failure (the maxfail analogue),
    - q/2 - 1 "class-4/5" exploration points: uniform in the box.

All restarts advance in lockstep (vmap over a fori_loop of rounds); every
candidate in a round is one vmapped objective batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from code_robchar_tpu.models import objectives
from code_robchar_tpu.models.base import BatchResult, ControlOptimizer
from code_robchar_tpu.ops.realform import fidelity_from_controller_sym

_Q = 10          # candidates per round (SNOBFIT's default nreq ~ n+6)
_SHRINK = 0.7    # trust-radius shrink on a failed round
_GROW = 1.3      # growth on success


def _snob_restart(x0, key, infid, lower, upper, budget):
    d = x0.shape[0]
    rounds = budget // _Q
    span = upper - lower

    key, k0 = jax.random.split(key)
    f0, c0 = infid(x0, k0)

    def round_body(r, carry):
        best_x, best_f, radius, nfev, key = carry
        key, kd, kg, ku, ke = jax.random.split(key, 5)

        # --- local quadratic model via symmetric differences (class 1/2)
        h = radius[None, :] * 0.5
        probes_p = best_x + jnp.eye(d, dtype=x0.dtype) * h.T
        probes_m = best_x - jnp.eye(d, dtype=x0.dtype) * h.T
        # model gradient/curvature come from the *same* evaluations that
        # are billed as candidates below (they double as class-3 probes)
        kp = jax.random.split(kd, d)
        km = jax.random.split(ke, d)
        fp, _ = jax.vmap(infid)(jnp.clip(probes_p, lower, upper), kp)
        fm, _ = jax.vmap(infid)(jnp.clip(probes_m, lower, upper), km)
        grad = (fp - fm) / (2 * h[0])
        curv = jnp.maximum((fp + fm - 2 * best_f) / (h[0] ** 2), 1e-6)
        newton = best_x - jnp.clip(grad / curv, -radius, radius)

        # --- class-3 jitter + class-4/5 exploration
        n_jit = max(_Q // 2 - 1, 1)
        n_exp = max(_Q - 2 * d - 1 - n_jit, 1)
        jit = best_x + radius * jax.random.normal(kg, (n_jit, d), x0.dtype)
        exp = lower + span * jax.random.uniform(ku, (n_exp, d), x0.dtype)

        cands = jnp.concatenate([
            newton[None], jnp.clip(probes_p, lower, upper),
            jnp.clip(probes_m, lower, upper),
            jnp.clip(jit, lower, upper), exp], axis=0)
        kc = jax.random.split(key, cands.shape[0] + 1)
        key = kc[0]
        fs, cs = jax.vmap(infid)(cands, kc[1:])
        # bill the model probes + candidates (they are all real evals)
        nfev = (nfev + jnp.sum(cs)).astype(jnp.int32)

        i = jnp.argmin(fs)
        improved = fs[i] < best_f
        best_x = jnp.where(improved, cands[i], best_x)
        best_f = jnp.where(improved, fs[i], best_f)
        radius = jnp.where(improved, jnp.minimum(radius * _GROW, span),
                           jnp.maximum(radius * _SHRINK, 1e-6 * span))
        return best_x, best_f, radius, nfev, key

    init = (x0, f0, 0.1 * span, c0.astype(jnp.int32), key)
    best_x, best_f, _, nfev, _ = jax.lax.fori_loop(0, rounds, round_body,
                                                   init)
    return best_x, best_f, nfev


class SNOB(ControlOptimizer):
    name = "snob"
    budget_per_restart = 300

    def __init__(self, *args, budget: int = 300, **kwargs):
        super().__init__(*args, **kwargs)
        self.budget = budget  # qnewton.py:818-821: 300 either way
        self._batch_fn = None
        self._batch_cfg = None

    def _build_batch_fn(self):
        spec = self.spec()
        infid = objectives.make_infidelity(spec)
        lower, upper = self._lower, self._upper
        budget = self.budget
        h0, in_spin, out_spin = jnp.real(self.HH), self.In, self.Out
        # reference accounting: funccalls += budget (*train_size when
        # fixed-ham), regardless of the solver's internal eval count
        # (qnewton.py:862-866); adaptive uses the in-band increments.
        flat_bill = None if spec.adaptive else budget * spec.mul_fac

        @jax.jit
        def run_batch(x0s, keys):
            def one(x0, key):
                x, f, nfev = _snob_restart(x0, key, infid, lower, upper,
                                           budget)
                if spec.fixed_hams is not None:
                    fid = true = 1.0 - f  # qnewton.py:842-844
                else:
                    e, _ = infid(x, jax.random.fold_in(key, 5))
                    fid = 1.0 - e
                    true = fidelity_from_controller_sym(h0, x, in_spin, out_spin)
                billed = (nfev if flat_bill is None
                          else jnp.asarray(flat_bill, jnp.int32))
                return x, fid, true, billed, jnp.asarray(0, jnp.int32)

            xs, fids, trues, nfev, nit = jax.vmap(one)(x0s, keys)
            return BatchResult(xs, fids, trues, nfev, nit)

        return run_batch

    def _run_batch(self, x0s, keys) -> BatchResult:
        cfg = (float(self.noise), bool(self.fid_noisy), bool(self.ham_noisy),
               bool(self.use_fixed_ham), int(self.draws), bool(self.adaptive))
        if self._batch_fn is None or cfg != self._batch_cfg:
            self._batch_fn = self._build_batch_fn()
            self._batch_cfg = cfg
        return self._batch_fn(x0s, keys)
