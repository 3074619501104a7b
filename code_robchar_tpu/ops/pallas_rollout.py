"""Fused PPO rollout step: actor forward + env transition + physics in
ONE Pallas launch per environment step.

Reference behavior: the composed body of the rollout scan in
models/ppo.py (itself mirroring ppo.py:409-421 + RLreinforce...:122-133
/ 253-257 env semantics).  The XLA formulation of that body is ~50
small fusions per step — policy einsums with M=1, action wrap, time
normalisation, Hamiltonian assembly — whose fixed per-op overhead
dominates a 500-step sequential scan (~150 us/step at 512 agents while
the useful compute is ~30 us).  This kernel runs the whole step for a
lane-tile of agents in one launch:

  obs -> actor MLP -> Gaussian sample -> action wrap / time modulus ->
  noisy Hamiltonian assembly -> symmetric Jacobi transfer fidelity ->
  done/timeout bookkeeping

Layout: EVERYTHING rides lanes on the agent axis (feature, A), the
same orientation as the MC sweep and the in-scan physics
(ops/pallas_jacobi).  The actor weights arrive pre-transposed to
(d_in+1, d_out, A) with the bias folded in as the last input row, so
each layer is an unrolled sum of (d_out, TILE) VPU FMAs with sublane
broadcasts — per-agent weights can never share an MXU matmul, so the
VPU formulation with full 128-lane occupancy is the fast path.  The
Jacobi sweeps reuse pallas_jacobi.sym_sweeps_on_scratch on a VMEM
scratch block.

Restrictions (the production training regime): real structured
Hamiltonian noise or none (`ham_noisy`), no shot noise on the reward
(`fid_noisy=False`), no fixed-Hamiltonian ensemble.  models/ppo.py
falls back to the XLA scan body otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from code_robchar_tpu.ops.pallas_jacobi import (sym_sweeps_on_scratch,
                                               transfer_amp_from_scratch)


@functools.lru_cache(maxsize=None)
def make_actor_env_step(n: int, h: int, in_spin: int, out_spin: int,
                        sweeps: int, bmax: float, maxtime: float,
                        max_ep_len: int, ham_noisy: bool, tile: int,
                        interpret: bool = False):
    """Build the jitted fused step.

    Returns ``step(w1, w2, w3, log_std, h0f, action, tstep, ep_len,
    eps, zdiag, znn)`` with agent-trailing layouts:

      w1 (n+2, h, A)  w2 (h+1, h, A)  w3 (h+1, n+1, A)   [bias folded
      as the last input row]          log_std (n+1, A)
      h0f (n*n, 1)    action (n, A)   tstep/ep_len (1, A) float32
      eps (n+1, A)    zdiag (n, A)    znn (n-1, A)

    -> (obs (n+1, A), a (n+1, A), fid (1, A), obs2 (n+1, A),
        done (1, A), ttimeout (1, A), next_action (n, A),
        next_t (1, A), next_ep (1, A)) — done/ttimeout as 0/1 float32,
    ep_len as float32 counts (exact to 2**24).
    """
    d = n + 1          # obs/action dim
    d1 = d + 1         # + folded bias row
    nn = n * n
    bmax = float(bmax)
    maxtime = float(maxtime)

    def kernel(w1, w2, w3, ls, h0f, act_in, t_in, ep_in,
               eps, zdiag, znn,
               obs_out, a_out, fid_out, obs2_out, done_out, tto_out,
               nact_out, nt_out, nep_out, a_scr, v_scr):
        action = act_in[:, :]                      # (n, T)
        tstep = t_in[0, :]                         # (T,)

        # ---- actor MLP: unrolled FMA sums, bias = last input row ----
        z = w1[n, :, :] * tstep + w1[d, :, :]
        for k in range(n):
            z = z + w1[k, :, :] * action[k, :]
        h1 = jnp.tanh(z)                           # (h, T)
        z2 = w2[h, :, :]
        for k in range(h):
            z2 = z2 + w2[k, :, :] * h1[k, :]
        h2 = jnp.tanh(z2)                          # (h, T)
        mu = w3[h, :, :]
        for k in range(h):
            mu = mu + w3[k, :, :] * h2[k, :]       # (d, T)

        a = mu + jnp.exp(ls[:, :]) * eps[:, :]     # (d, T)

        # ---- env transition (models/ppo.py scan body semantics) ----
        raw = action + a[:n, :]
        # vector-wide wrap (env._wrap_action, RLreinforce...:253-257)
        over = jnp.zeros_like(tstep, dtype=jnp.bool_)
        for k in range(n):
            over = over | (jnp.abs(raw[k, :]) > bmax)
        den = jnp.sign(raw) * bmax + jnp.where(raw == 0.0, 1.0, 0.0)
        new_action = jnp.where(over, raw % den, raw)
        raw_t = tstep + a[n, :]
        abs_t = jnp.abs(raw_t)
        tt = jnp.where(abs_t > maxtime, abs_t % maxtime, abs_t)
        done = tt > raw_t

        # ---- physics: H = h0 + diag(action [+ zdiag]) [+ nn noise] ----
        a_scr[:, :] = jnp.broadcast_to(h0f[:, :], (nn, tile))
        for i in range(n):
            add = new_action[i, :]
            if ham_noisy:
                add = add + zdiag[i, :]
            a_scr[i * n + i, :] = a_scr[i * n + i, :] + add
        if ham_noisy:
            for i in range(1, n):
                zi = znn[i - 1, :]
                a_scr[i * n + (i - 1), :] = a_scr[i * n + (i - 1), :] + zi
                a_scr[(i - 1) * n + i, :] = a_scr[(i - 1) * n + i, :] + zi
        rows = jax.lax.broadcasted_iota(jnp.int32, (2 * n, tile), 0)
        sel = (rows == (0 * n + in_spin)) | (rows == (1 * n + out_spin))
        v_scr[:, :] = jnp.where(sel, 1.0, 0.0).astype(jnp.float32)
        sym_sweeps_on_scratch(n, sweeps, a_scr, v_scr)
        phr, phi = transfer_amp_from_scratch(n, a_scr, v_scr, tt)
        fid = phr * phr + phi * phi

        # ---- bookkeeping ----
        ep1 = ep_in[0, :] + 1.0
        ttimeout = ep1 == float(max_ep_len)
        terminal = done | ttimeout

        for i in range(n):
            obs_out[i, :] = action[i, :]
            obs2_out[i, :] = new_action[i, :]
            nact_out[i, :] = jnp.where(terminal, 0.0, new_action[i, :])
        obs_out[n, :] = tstep
        obs2_out[n, :] = tt
        a_out[:, :] = a
        fid_out[0, :] = fid
        done_out[0, :] = done.astype(jnp.float32)
        tto_out[0, :] = ttimeout.astype(jnp.float32)
        nt_out[0, :] = jnp.where(terminal, 0.0, tt)
        nep_out[0, :] = jnp.where(terminal, 0.0, ep1)

    def spec(*shape):
        return pl.BlockSpec(shape[:-1] + (tile,),
                            lambda i, _s=len(shape): (0,) * (_s - 1) + (i,))

    f32 = jnp.float32

    @jax.jit
    def step(w1, w2, w3, log_std, h0f, action, tstep, ep_len,
             eps, zdiag, znn):
        A = action.shape[-1]
        grid = (A // tile,)
        out_shape = [
            jax.ShapeDtypeStruct((d, A), f32),    # obs
            jax.ShapeDtypeStruct((d, A), f32),    # a
            jax.ShapeDtypeStruct((1, A), f32),    # fid
            jax.ShapeDtypeStruct((d, A), f32),    # obs2
            jax.ShapeDtypeStruct((1, A), f32),    # done
            jax.ShapeDtypeStruct((1, A), f32),    # ttimeout
            jax.ShapeDtypeStruct((n, A), f32),    # next action
            jax.ShapeDtypeStruct((1, A), f32),    # next t
            jax.ShapeDtypeStruct((1, A), f32),    # next ep_len
        ]
        out_specs = [spec(d, A), spec(d, A), spec(1, A), spec(d, A),
                     spec(1, A), spec(1, A), spec(n, A), spec(1, A),
                     spec(1, A)]
        in_specs = [
            spec(d1, h, A), spec(h + 1, h, A), spec(h + 1, d, A),
            spec(d, A),
            pl.BlockSpec((nn, 1), lambda i: (0, 0)),
            spec(n, A), spec(1, A), spec(1, A),
            spec(d, A), spec(n, A), spec(n - 1, A),
        ]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[pltpu.VMEM((nn, tile), f32),
                            pltpu.VMEM((2 * n, tile), f32)],
            interpret=interpret,
        )(w1, w2, w3, log_std, h0f, action, tstep, ep_len,
          eps, zdiag, znn)

    return step


def fold_actor_weights(params):
    """(w1, w2, w3, log_std) in kernel layout from a batched (leading
    agent axis) ActorCritic param tree: bias folded as the LAST input
    row, axes moved to (d_in+1, d_out, A)."""
    mlp = params["params"]["pi"]["MLP_0"]

    def fold(layer):
        wb = jnp.concatenate([layer["kernel"], layer["bias"][:, None, :]],
                             axis=1)
        return jnp.moveaxis(wb, 0, -1).astype(jnp.float32)

    w1, w2, w3 = (fold(mlp[f"Dense_{i}"]) for i in range(3))
    log_std = jnp.moveaxis(params["params"]["pi"]["log_std"], 0,
                           -1).astype(jnp.float32)
    return w1, w2, w3, log_std
