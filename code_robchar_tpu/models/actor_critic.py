"""Flax actor-critic for PPO controller synthesis.

Reference: ppo_core.py:18-118 (torch MLPs).  Same architecture contract:
tanh MLP with (100, 100) hidden units for both heads, Gaussian policy with
a state-independent learned log-std initialised at -0.5, log-prob summed
over action dims, value head squeezed to a scalar.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class MLP(nn.Module):
    sizes: Sequence[int]
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        act = getattr(nn, self.activation)
        for i, width in enumerate(self.sizes):
            x = nn.Dense(width)(x)
            if i < len(self.sizes) - 1:
                x = act(x)
        return x


class GaussianActor(nn.Module):
    act_dim: int
    hidden: Sequence[int] = (100, 100)

    @nn.compact
    def __call__(self, obs):
        mu = MLP(sizes=(*self.hidden, self.act_dim))(obs)
        log_std = self.param("log_std",
                             lambda _key, shape: -0.5 * jnp.ones(shape),
                             (self.act_dim,))
        return mu, log_std


class Critic(nn.Module):
    hidden: Sequence[int] = (100, 100)

    @nn.compact
    def __call__(self, obs):
        v = MLP(sizes=(*self.hidden, 1))(obs)
        return jnp.squeeze(v, axis=-1)


class ActorCritic(nn.Module):
    """pi + v bundle (ppo_core.py:98-107)."""
    act_dim: int
    hidden: Sequence[int] = (100, 100)

    def setup(self):
        self.pi = GaussianActor(self.act_dim, self.hidden)
        self.v = Critic(self.hidden)

    def __call__(self, obs):
        mu, log_std = self.pi(obs)
        return mu, log_std, self.v(obs)

    def actor(self, obs):
        return self.pi(obs)

    def critic(self, obs):
        return self.v(obs)


def gaussian_logp(mu, log_std, act):
    """Diagonal-Gaussian log-density summed over the action axis
    (ppo_core.py:85-86)."""
    std = jnp.exp(log_std)
    z = (act - mu) / std
    return jnp.sum(-0.5 * z**2 - log_std - 0.5 * jnp.log(2 * jnp.pi),
                   axis=-1)


def policy_step(params, apply_fn, obs, key) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                     jnp.ndarray]:
    """Sample (action, value, logp) — the no-grad acting step
    (ppo_core.py:109-115)."""
    mu, log_std, v = apply_fn(params, obs)
    a = mu + jnp.exp(log_std) * jax.random.normal(key, mu.shape, mu.dtype)
    logp = gaussian_logp(mu, log_std, a)
    return a, v, logp


def count_vars(params) -> int:
    return sum(int(jnp.size(p)) for p in jax.tree.leaves(params))
