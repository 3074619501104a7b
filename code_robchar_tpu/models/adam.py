"""Batched Adam controller search on the exact analytic gradient.

Reference: the Adam subclass (qnewton.py:641-768) — a single sequential
stream of Adam updates on ``eval_static_fidelity_gradient`` with Sobol
restarts every 5000 iterations that must pass a gradient-norm gate
(threshold 1e-4 for N > 7, else 1e-2), hyperparameters beta1=.9,
beta2=.999, eta=0.008 for N > 7 else 0.03, and the reference's
(bias-uncorrected-by-constant) m_hat = m/(1-beta1), v_hat = v/(1-beta2)
normalisation.  Only supports run_until_told_to_stop + landscape
exploration (qnewton.py:647-648).

TPU-native shape: many independent Adam streams advance in lockstep
(vmap over streams of a `lax.scan` segment); the host loop splices segment
results into the record protocol.  One fcall is billed per iteration and
per restart-gate probe, matching qnewton.py:694-696, 712.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from code_robchar_tpu.models import objectives
from code_robchar_tpu.models.base import BatchResult, ControlOptimizer
from code_robchar_tpu.ops.realform import fidelity_from_controller_sym

_BETA1, _BETA2 = 0.9, 0.999
_RESTART_EVERY = 5000


class Adam(ControlOptimizer):
    name = "adam"
    default_batch = 64        # parallel Adam streams
    segment_its = 1000        # iterations fused per device dispatch

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        if not (self.run_until_told_to_stop and self.landscape_exploration):
            raise Exception("alternative functionality isn't available yet.")
        self.eta = 0.008 if self.Nspin > 7 else 0.03
        self.grad_gate = 1e-4 if self.Nspin > 7 else 1e-2
        self._seg_fn = None

    def _build_segment(self):
        spec = self.spec()
        exact = objectives.make_exact_gradient(spec)
        infid_eval = objectives.make_infidelity(spec)
        h0, in_spin, out_spin = jnp.real(self.HH), self.In, self.Out
        lower, upper = self._lower, self._upper
        eta, gate = self.eta, self.grad_gate
        seg = self.segment_its

        # Sobol restart candidates (qnewton.py:659-660, 683-684): the
        # quasi-MC stream is generated host-side and indexed by iteration
        # on device, keeping the restart gate pure inside the scan.
        sobol_table = jnp.asarray(self._sobol_stream(4096)) \
            if self.landscape_exploration else None

        def step(carry, _):
            w, m, v, it, key = carry

            # restart gate every 5000 its: candidate must clear the
            # gradient-norm gate (restart probes bill 1 fcall each).
            key, kr = jax.random.split(key)
            need_restart = ((it + 1) % _RESTART_EVERY == 0)
            if sobol_table is not None:
                u = sobol_table[(it // _RESTART_EVERY) %
                                sobol_table.shape[0]].astype(w.dtype)
            else:
                u = jax.random.uniform(kr, w.shape, dtype=w.dtype)
            w_cand = lower + (upper - lower) * u
            _, g_cand = exact(w_cand)
            cand_ok = jnp.linalg.norm(g_cand) > gate
            w = jnp.where(need_restart & cand_ok, w_cand, w)
            extra_call = need_restart.astype(jnp.int32)

            err, grad = exact(w)
            m = _BETA1 * m + (1 - _BETA1) * grad
            v = _BETA2 * v + (1 - _BETA2) * grad * grad
            m_hat = m / (1 - _BETA1)
            v_hat = v / (1 - _BETA2)
            w = w - eta * m_hat / (jnp.sqrt(v_hat) + 1e-8)
            return (w, m, v, it + 1, key), (err, 1 + extra_call)

        @jax.jit
        def run_segment(w0, m0, v0, it0, keys):
            def one(w, m, v, it, key):
                (w, m, v, it, key), (errs, calls) = jax.lax.scan(
                    step, (w, m, v, it, key), None, length=seg)
                e, _ = infid_eval(w, jax.random.fold_in(key, 7))
                fid = 1.0 - e
                true = fidelity_from_controller_sym(h0, w, in_spin, out_spin)
                return w, m, v, it, fid, true, jnp.sum(calls)

            return jax.vmap(one)(w0, m0, v0, it0, keys)

        return run_segment

    def _run_batch(self, x0s, keys) -> BatchResult:
        """One segment of `segment_its` Adam iterations across the stream
        batch.  The base-class loop treats each segment as a 'batch of
        restarts' for record purposes; iterations tally via nit."""
        if self._seg_fn is None:
            self._seg_fn = self._build_segment()
        k = x0s.shape[0]
        if not hasattr(self, "_stream") or self._stream[0].shape[0] != k:
            m0 = jax.random.uniform(self.next_key(), (k, self.Nspin + 1))
            v0 = jax.random.uniform(self.next_key(), (k, self.Nspin + 1))
            self._stream = (jnp.asarray(x0s), m0, v0,
                            jnp.zeros(k, jnp.int32))
        w, m, v, it = self._stream
        w, m, v, it, fid, true, calls = self._seg_fn(w, m, v, it, keys)
        self._stream = (w, m, v, it)
        return BatchResult(w, fid, true, calls,
                           jnp.full(k, self.segment_its, jnp.int32))

    def run(self):
        # Adam is a persistent stream, not independent restarts: cap the
        # number of segments by the fcall budget; repeats is irrelevant
        # (reference loops on tot_its alone, qnewton.py:674).
        self.repeats = int(1e18)
        return super().run()
