"""Fused PPO rollout: actor forward + env transition + physics as
Pallas kernels, up to the WHOLE trajectory in one launch.

Reference behavior: the composed body of the rollout scan in
models/ppo.py (itself mirroring ppo.py:409-421 + RLreinforce...:122-133
/ 253-257 env semantics).  The XLA formulation of that body is ~50
small fusions per step — policy einsums with M=1, action wrap, time
normalisation, Hamiltonian assembly — whose fixed per-op overhead
dominates a 500-step sequential scan (~150 us/step at 512 agents while
the useful compute is ~30 us).  Each step is:

  obs -> actor MLP -> Gaussian sample -> action wrap / time modulus ->
  noisy Hamiltonian assembly -> symmetric Jacobi transfer fidelity ->
  done/timeout bookkeeping

``make_actor_env_rollout`` is the PRODUCTION path (models/ppo.py):
grid (A/tile, T/tc), the actor weights DMA'd from HBM into persistent
VMEM scratch once per agent tile, the env carry held in scratch across
T-chunks, noise streamed in and the trajectory streamed out.  v5e:
rollout 62.6 -> 44 ms at 512 agents (vs the XLA scan), epoch peak
1.43M env-steps/s at 1024 agents.  (A one-launch-per-step variant was
measured at only ~1%/epoch — weights re-read per launch, ~6 MB/tile —
and removed; see PERF.md and git history.)

Layout: EVERYTHING rides lanes on the agent axis (feature, A), the
same orientation as the MC sweep and the in-scan physics
(ops/pallas_jacobi).  The actor weights arrive pre-transposed to
(d_in+1, d_out, A) with the bias folded in as the last input row and
feature dims zero-padded to the sublane tiling, so each layer is an
unrolled sum of (d_out, TILE) VPU FMAs with sublane broadcasts —
per-agent weights can never share an MXU matmul, so the VPU
formulation with full 128-lane occupancy is the fast path.  The
Jacobi sweeps reuse pallas_jacobi.sym_sweeps_on_scratch on a VMEM
scratch block.

Restrictions (the production training regime): real structured
Hamiltonian noise or none (`ham_noisy`), no shot noise on the reward
(`fid_noisy=False`), no fixed-Hamiltonian ensemble, agent count a
multiple of 128 (the weight-DMA lane alignment).  models/ppo.py falls
back to the XLA scan body otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from code_robchar_tpu.ops.pallas_jacobi import (sym_sweeps_on_scratch,
                                               transfer_amp_from_scratch)


def _step_math(n, h, in_spin, out_spin, sweeps, bmax, maxtime, max_ep_len,
               ham_noisy, tile, w1, w2, w3, ls, h0f, action, tstep, ep,
               eps, zdiag, znn, a_scr, v_scr):
    """One environment step on (feature, tile) VALUES; weight args are
    refs (or ref-like) indexed per input row.  Returns
    (a, fid, obs2_act, tt, done, ttimeout, nact, nt, nep1) — shared by
    the per-step and whole-trajectory kernels."""
    d = n + 1
    nn = n * n

    # ---- actor MLP: unrolled FMA sums, bias = last input row.  The
    # feature-out dims may be zero-padded to the sublane tiling (see
    # fold_actor_weights); padded rows stay exactly zero through tanh
    # and are sliced away at mu. ----
    z = w1[n, :, :] * tstep + w1[d, :, :]
    for k in range(n):
        z = z + w1[k, :, :] * action[k, :]
    h1 = jnp.tanh(z)                           # (hp, T)
    z2 = w2[h, :, :]
    for k in range(h):
        z2 = z2 + w2[k, :, :] * h1[k, :]
    h2 = jnp.tanh(z2)                          # (hp, T)
    mu = w3[h, :, :]
    for k in range(h):
        mu = mu + w3[k, :, :] * h2[k, :]       # (dp, T)

    a = mu[:d, :] + jnp.exp(ls[:d, :]) * eps   # (d, T)

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
    ep1 = ep + 1.0
    ttimeout = ep1 == float(max_ep_len)
    terminal = done | ttimeout
    nact = jnp.where(terminal, 0.0, new_action)
    nt = jnp.where(terminal, 0.0, tt)
    nep = jnp.where(terminal, 0.0, ep1)
    return a, fid, new_action, tt, done, ttimeout, nact, nt, nep


@functools.lru_cache(maxsize=None)
def make_actor_env_rollout(n: int, h: int, in_spin: int, out_spin: int,
                           sweeps: int, bmax: float, maxtime: float,
                           max_ep_len: int, ham_noisy: bool, tile: int,
                           tc: int, interpret: bool = False):
    """Whole-trajectory variant: the ENTIRE T-step rollout in one
    pallas_call.

    Grid (A/tile, T/tc), T-chunks innermost.  The actor weights stay in
    HBM (`pltpu.ANY`) and are DMA'd into persistent VMEM scratch ONCE
    per agent tile (at chunk 0) instead of once per step — the per-step
    kernel above re-reads ~6 MB of weights every launch, which is why
    it only buys ~1%.  The env carry (action, time, episode length)
    lives in VMEM scratch across chunks; noise draws stream in and
    trajectory slices stream out as (tc, feat, tile) blocks.  The
    pre-step obs is NOT emitted: obs_t = where(terminal_{t-1}, 0,
    obs2_{t-1}) is reconstructed outside from obs2/done/timeout.

    Returns ``run(w1, w2, w3, log_std, h0f, action, tstep, ep_len,
    eps, zdiag, znn)`` -> (a (T, d, A), fid (T, 1, A), obs2 (T, d, A),
    done (T, 1, A), ttimeout (T, 1, A), next_action (n, A),
    next_t (1, A), next_ep (1, A)).
    """
    d = n + 1
    d1 = d + 1
    nn = n * n
    hp = h + (-h) % 8  # sublane-padded feature dims (fold_actor_weights)
    dp = d + (-d) % 8
    f32 = jnp.float32

    def kernel(w1h, w2h, w3h, lsh, h0f, act_in, t_in, ep_in,
               eps, zdiag, znn,
               a_out, fid_out, obs2_out, done_out, tto_out,
               nact_out, nt_out, nep_out,
               w1, w2, w3, ls, act_s, t_s, ep_s, a_scr, v_scr, sems):
        ai = pl.program_id(0)

        @pl.when(pl.program_id(1) == 0)
        def _load_tile():
            copies = [
                pltpu.make_async_copy(
                    src.at[:, :, pl.ds(ai * tile, tile)], dst, sems.at[i])
                for i, (src, dst) in enumerate(
                    ((w1h, w1), (w2h, w2), (w3h, w3)))]
            copies.append(pltpu.make_async_copy(
                lsh.at[:, pl.ds(ai * tile, tile)], ls, sems.at[3]))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            act_s[:, :] = act_in[:, :]
            t_s[:, :] = t_in[:, :]
            ep_s[:, :] = ep_in[:, :]

        def body(s, _):
            action = act_s[:, :]
            tstep = t_s[0, :]
            (a, fid, new_action, tt, done, ttimeout, nact, nt,
             nep) = _step_math(n, h, in_spin, out_spin, sweeps, bmax,
                               maxtime, max_ep_len, ham_noisy, tile,
                               w1, w2, w3, ls, h0f, action, tstep,
                               ep_s[0, :], eps[s], zdiag[s], znn[s],
                               a_scr, v_scr)
            a_out[s] = a
            fid_out[s, 0, :] = fid
            for i in range(n):
                obs2_out[s, i, :] = new_action[i, :]
            obs2_out[s, n, :] = tt
            done_out[s, 0, :] = done.astype(f32)
            tto_out[s, 0, :] = ttimeout.astype(f32)
            act_s[:, :] = nact
            t_s[0, :] = nt
            ep_s[0, :] = nep
            return 0

        jax.lax.fori_loop(0, tc, body, 0)
        nact_out[:, :] = act_s[:, :]
        nt_out[:, :] = t_s[:, :]
        nep_out[:, :] = ep_s[:, :]

    def tspec(*shape):
        return pl.BlockSpec((tc,) + shape[1:-1] + (tile,),
                            lambda a, c, _s=len(shape):
                                (c,) + (0,) * (_s - 2) + (a,))

    def cspec(*shape):
        return pl.BlockSpec(shape[:-1] + (tile,),
                            lambda a, c, _s=len(shape):
                                (0,) * (_s - 1) + (a,))

    @jax.jit
    def run(w1, w2, w3, log_std, h0f, action, tstep, ep_len,
            eps, zdiag, znn):
        A = action.shape[-1]
        T = eps.shape[0]
        grid = (A // tile, T // tc)
        in_specs = [
            pl.BlockSpec(memory_space=pl.ANY),   # w1 (d1, h, A)
            pl.BlockSpec(memory_space=pl.ANY),   # w2 (h+1, h, A)
            pl.BlockSpec(memory_space=pl.ANY),   # w3 (h+1, d, A)
            pl.BlockSpec(memory_space=pl.ANY),   # log_std (d, A)
            pl.BlockSpec((nn, 1), lambda a, c: (0, 0)),
            cspec(n, A), cspec(1, A), cspec(1, A),
            tspec(T, d, A), tspec(T, n, A), tspec(T, n - 1, A),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((T, d, A), f32),   # a
            jax.ShapeDtypeStruct((T, 1, A), f32),   # fid
            jax.ShapeDtypeStruct((T, d, A), f32),   # obs2
            jax.ShapeDtypeStruct((T, 1, A), f32),   # done
            jax.ShapeDtypeStruct((T, 1, A), f32),   # ttimeout
            jax.ShapeDtypeStruct((n, A), f32),      # next action
            jax.ShapeDtypeStruct((1, A), f32),      # next t
            jax.ShapeDtypeStruct((1, A), f32),      # next ep_len
        ]
        out_specs = [tspec(T, d, A), tspec(T, 1, A), tspec(T, d, A),
                     tspec(T, 1, A), tspec(T, 1, A),
                     cspec(n, A), cspec(1, A), cspec(1, A)]
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=[
                pltpu.VMEM((d1, hp, tile), f32),
                pltpu.VMEM((h + 1, hp, tile), f32),
                pltpu.VMEM((h + 1, dp, tile), f32),
                pltpu.VMEM((dp, tile), f32),
                pltpu.VMEM((n, tile), f32),
                pltpu.VMEM((1, tile), f32),
                pltpu.VMEM((1, tile), f32),
                pltpu.VMEM((nn, tile), f32),
                pltpu.VMEM((2 * n, tile), f32),
                pltpu.SemaphoreType.DMA((4,)),
            ],
            interpret=interpret,
        )(w1, w2, w3, log_std, h0f, action, tstep, ep_len,
          eps, zdiag, znn)

    return run


def rollout_chunk(t_len: int) -> int:
    """Largest T-chunk <= 128 dividing the trajectory length."""
    return max(c for c in range(1, min(t_len, 128) + 1) if t_len % c == 0)


def fold_actor_weights(params):
    """(w1, w2, w3, log_std) in kernel layout from a batched (leading
    agent axis) ActorCritic param tree: bias folded as the LAST input
    row, axes moved to (d_in+1, d_out, A)."""
    mlp = params["params"]["pi"]["MLP_0"]

    def fold(layer):
        wb = jnp.concatenate([layer["kernel"], layer["bias"][:, None, :]],
                             axis=1)
        wb = jnp.moveaxis(wb, 0, -1).astype(jnp.float32)
        # zero-pad the feature-out dim to the sublane tiling (8) so the
        # whole-trajectory kernel's HBM->VMEM weight DMA is tile-aligned
        pad = (-wb.shape[1]) % 8
        if pad:
            wb = jnp.pad(wb, ((0, 0), (0, pad), (0, 0)))
        return wb

    w1, w2, w3 = (fold(mlp[f"Dense_{i}"]) for i in range(3))
    log_std = jnp.moveaxis(params["params"]["pi"]["log_std"], 0,
                           -1).astype(jnp.float32)
    pad = (-log_std.shape[0]) % 8
    if pad:
        log_std = jnp.pad(log_std, ((0, pad), (0, 0)))
    return w1, w2, w3, log_std
