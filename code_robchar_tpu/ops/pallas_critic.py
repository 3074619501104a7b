"""Fused VMEM-resident PPO critic regression kernel.

Reference: ppo.py:289-334 — the value-function loop runs
``train_v_iters`` (200) full-batch Adam steps of the (100,100) tanh
critic MLP on the epoch's 500-step rollout.  In the XLA formulation each
iteration round-trips the activations (T x 100 per agent) and the Adam
moments through HBM, so the loop is bandwidth-bound: measured 329 ms for
200 iterations at 512 agents on one v5e chip while the matmul FLOPs
account for ~15 ms.  This kernel runs the ENTIRE loop for one agent per
grid step with the critic parameters, both Adam moments, the rollout
batch and every activation resident in VMEM (~0.5 MB/agent), reducing
HBM traffic from ~400 MB/iteration to one read + one write of the
~150 KB agent state.

Layout: the batch axis T rides the sublane (M) dimension padded to a
multiple of 128, features ride lanes, so the three large matmuls per
iteration — forward ``h1a @ Wb2`` (T,101)x(101,100), backward
``h1a^T @ dz2`` (101,T)x(T,100) and ``dz2 @ Wb2^T`` (T,100)x(100,101) —
hit the MXU with full M tiles.  Biases are folded into the weight
matrices by augmenting activations with a ones column, collapsing the
parameter state to three tensors (Wb1, Wb2, wb3) and their moments.

Semantics match the optax.adam fori_loop path exactly: gradient of
mean((v - ret)^2) over the T valid samples, Adam with bias correction at
count+i+1, count advanced by ``iters``.  Padding rows are masked out of
dv so they contribute exactly zero gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _contract(a, b, dims, fast_dot):
    """dot_general with optional bf16-input fast path (the XLA critic
    path's matmuls run at the TPU DEFAULT precision, which is the same
    single-pass bf16)."""
    if fast_dot:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


@functools.lru_cache(maxsize=None)
def _build(T: int, Tp: int, d1: int, h: int, iters: int, lr: float,
           beta1: float, beta2: float, eps: float, fast_dot: bool,
           block: int, interpret: bool):
    """``block`` agents share one grid step: their independent per-agent
    chains sit in the same loop body, letting the Mosaic scheduler overlap
    one agent's MXU dots with another's VPU tanh/Adam work (a single
    agent's chain is serialization-bound, not FLOP-bound).  Measured on
    v5e at T=500/h=100: block=1 -> 834k, block=2 -> 977k, block=4 ->
    956k env-steps/s epoch throughput; block=8 exceeds the 16 MB scoped
    VMEM limit (~2.7 MB/agent of weights+moments+activations).

    Roofline (v5e, measured): the kernel is VPU-bound, not MXU-bound —
    per iteration-pair the VPU owes ~2x(tanh on (512,100) twice + Adam
    on 11.2k params + elementwise backward), which models to ~250 ms
    for 768 agents x 200 iters and matches the measured ~236 ms.  A
    variant that moved the three width-1 value-head dots (K/N padded
    1 -> 128 on the MXU) to VPU broadcast/reduction forms was REJECTED
    by measurement: 512-agent epochs went 217 -> 245 ms because the
    added VPU work lands on the critical unit while the MXU idles.
    A cheaper tanh was the one remaining candidate lever; a
    fetch-barrier microbench (artifacts/perf/tanh_microbench.py,
    round 4) refuted it: Mosaic lowers ``jnp.tanh`` to mul-parity
    (~0.85 ps/elem marginal vs 1.18 for a multiply on v5e), and a
    rational P13/Q6 replacement measures ~8x slower.  The kernel is at
    its VPU roof."""
    Ba = block

    def kernel(count_ref, wb1_ref, wb2_ref, wb3_ref,
               mu1_ref, mu2_ref, mu3_ref, nu1_ref, nu2_ref, nu3_ref,
               obs_ref, ret_ref,
               count_out, wb1_out, wb2_out, wb3_out,
               mu1_out, mu2_out, mu3_out, nu1_out, nu2_out, nu3_out):
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tp, 1), 0)
        mask = (rows < T).astype(jnp.float32)
        ones_col = jnp.ones((Tp, 1), jnp.float32)
        lb1 = jnp.log(jnp.float32(beta1))
        lb2 = jnp.log(jnp.float32(beta2))

        def adam(p, mu, nu, g, bc1, bc2):
            mu = beta1 * mu + (1.0 - beta1) * g
            nu = beta2 * nu + (1.0 - beta2) * g * g
            step = (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
            return p - lr * step, mu, nu

        def agent_step(i, st, obs, ret, c0):
            wb1, wb2, wb3, mu1, mu2, mu3, nu1, nu2, nu3 = st
            # forward
            h1 = jnp.tanh(_contract(obs, wb1, ((1,), (0,)), fast_dot))
            h1a = jnp.concatenate([h1, ones_col], axis=1)   # (Tp, h+1)
            h2 = jnp.tanh(_contract(h1a, wb2, ((1,), (0,)), fast_dot))
            h2a = jnp.concatenate([h2, ones_col], axis=1)
            v = _contract(h2a, wb3, ((1,), (0,)), fast_dot)  # (Tp, 1)
            # backward of mean((v - ret)^2) over the T valid rows
            dv = (2.0 / T) * (v - ret) * mask
            g3 = _contract(h2a, dv, ((0,), (0,)), fast_dot)  # (h+1, 1)
            dh2 = _contract(dv, wb3, ((1,), (1,)), fast_dot)[:, :h]
            dz2 = dh2 * (1.0 - h2 * h2)
            g2 = _contract(h1a, dz2, ((0,), (0,)), fast_dot)  # (h+1, h)
            dh1 = _contract(dz2, wb2, ((1,), (1,)), fast_dot)[:, :h]
            dz1 = dh1 * (1.0 - h1 * h1)
            g1 = _contract(obs, dz1, ((0,), (0,)), fast_dot)  # (d1, h)
            # Adam with optax bias correction at t = count + i + 1
            t = (c0 + i + 1).astype(jnp.float32)              # (1, 1)
            bc1 = 1.0 - jnp.exp(t * lb1)
            bc2 = 1.0 - jnp.exp(t * lb2)
            wb1, mu1, nu1 = adam(wb1, mu1, nu1, g1, bc1, bc2)
            wb2, mu2, nu2 = adam(wb2, mu2, nu2, g2, bc1, bc2)
            wb3, mu3, nu3 = adam(wb3, mu3, nu3, g3, bc1, bc2)
            return wb1, wb2, wb3, mu1, mu2, mu3, nu1, nu2, nu3

        obs_a = [obs_ref[a] for a in range(Ba)]
        ret_a = [ret_ref[a] for a in range(Ba)]
        c0_a = [count_ref[a] for a in range(Ba)]
        init = tuple(
            (wb1_ref[a], wb2_ref[a], wb3_ref[a],
             mu1_ref[a], mu2_ref[a], mu3_ref[a],
             nu1_ref[a], nu2_ref[a], nu3_ref[a])
            for a in range(Ba))

        def body(i, sts):
            return tuple(agent_step(i, sts[a], obs_a[a], ret_a[a], c0_a[a])
                         for a in range(Ba))

        out = jax.lax.fori_loop(0, iters, body, init)
        for a in range(Ba):
            count_out[a] = c0_a[a] + iters
            for ref, val in zip((wb1_out, wb2_out, wb3_out,
                                 mu1_out, mu2_out, mu3_out,
                                 nu1_out, nu2_out, nu3_out), out[a]):
                ref[a] = val

    def spec(*shape):
        return pl.BlockSpec((Ba,) + shape,
                            lambda a: (a,) + (0,) * len(shape))

    param_shapes = [(d1, h), (h + 1, h), (h + 1, 1)]

    def run(count, wb1, wb2, wb3, mu1, mu2, mu3, nu1, nu2, nu3,
            obs_aug, ret):
        A = count.shape[0]
        in_specs = ([spec(1, 1)] + [spec(*s) for s in param_shapes] * 3
                    + [spec(Tp, d1), spec(Tp, 1)])
        out_specs = [spec(1, 1)] + [spec(*s) for s in param_shapes] * 3
        out_shape = ([jax.ShapeDtypeStruct((A, 1, 1), jnp.int32)]
                     + [jax.ShapeDtypeStruct((A,) + s, jnp.float32)
                        for s in param_shapes] * 3)
        return pl.pallas_call(
            kernel,
            grid=(A // Ba,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(count, wb1, wb2, wb3, mu1, mu2, mu3, nu1, nu2, nu3,
          obs_aug, ret)

    return run


def _critic_leaves(tree):
    """The three critic Dense layers inside the ActorCritic param tree."""
    mlp = tree["params"]["v"]["MLP_0"]
    return [mlp[f"Dense_{i}"] for i in range(3)]


def _pack_batched(dense_layers):
    """Leaves carry a leading agent axis A."""
    return tuple(
        jnp.concatenate([d["kernel"], d["bias"][:, None, :]], axis=1)
        for d in dense_layers)


def _unpack_into(tree, packed):
    """Write (Wb1, Wb2, wb3) with leading A back into the tree's critic
    leaves; everything else is untouched."""
    mlp = dict(tree["params"]["v"]["MLP_0"])
    for i, wb in enumerate(packed):
        mlp[f"Dense_{i}"] = {"kernel": wb[:, :-1, :], "bias": wb[:, -1, :]}
    v = dict(tree["params"]["v"]); v["MLP_0"] = mlp
    p = dict(tree["params"]); p["v"] = v
    out = dict(tree); out["params"] = p
    return out


def critic_train(params, vf_opt, obs, rets, *, iters: int, lr: float,
                 beta1: float = 0.9, beta2: float = 0.999,
                 eps: float = 1e-8, fast_dot: bool = True,
                 block: int = 2, interpret: bool = False):
    """Run ``iters`` full-batch Adam steps of the critic on (obs, rets).

    params/vf_opt leaves carry a leading agent axis A; obs is (A, T, d)
    and rets (A, T).  Returns (params', vf_opt') with only the critic
    leaves (and the Adam count) advanced — exactly what the reference's
    value loop changes (ppo.py:289-334; the pi leaves' vf moments stay
    zero under zero gradients).
    """
    A, T, d = obs.shape
    h = params["params"]["v"]["MLP_0"]["Dense_1"]["kernel"].shape[-1]
    Tp = _round_up(T, 128)
    block = min(block, A)
    Ap = _round_up(A, block)
    adam_state = vf_opt[0]
    wbs = _pack_batched(_critic_leaves(params))
    mus = _pack_batched(_critic_leaves(adam_state.mu))
    nus = _pack_batched(_critic_leaves(adam_state.nu))
    count = jnp.reshape(adam_state.count, (A, 1, 1)).astype(jnp.int32)
    ones = jnp.ones((A, T, 1), obs.dtype)
    obs_aug = jnp.concatenate([obs, ones], axis=2)
    obs_aug = jnp.pad(obs_aug, ((0, 0), (0, Tp - T), (0, 0)))
    ret = jnp.pad(rets[..., None], ((0, 0), (0, Tp - T), (0, 0)))

    inputs = [count, *wbs, *mus, *nus,
              obs_aug.astype(jnp.float32), ret.astype(jnp.float32)]
    if Ap != A:
        # pad with copies of agent 0 (results discarded)
        inputs = [jnp.concatenate(
            [x, jnp.broadcast_to(x[:1], (Ap - A,) + x.shape[1:])], axis=0)
            for x in inputs]
    run = _build(T, Tp, d + 1, h, int(iters), float(lr), float(beta1),
                 float(beta2), float(eps), bool(fast_dot), int(block),
                 bool(interpret))
    out = run(*inputs)
    if Ap != A:
        out = [x[:A] for x in out]
    count_n = jnp.reshape(out[0], (A,)).astype(adam_state.count.dtype)
    wbs_n, mus_n, nus_n = out[1:4], out[4:7], out[7:10]

    params_n = _unpack_into(params, wbs_n)
    adam_n = adam_state._replace(count=count_n,
                                 mu=_unpack_into(adam_state.mu, mus_n),
                                 nu=_unpack_into(adam_state.nu, nus_n))
    return params_n, (adam_n,) + tuple(vf_opt[1:])
