import time, jax, jax.numpy as jnp, numpy as np
from code_robchar_tpu.models.ppo import PPO_en
tiny = jax.jit(lambda a: a @ a)(jnp.ones((8, 8))); np.asarray(tiny)
def fetch(x): return float(jnp.sum(x))
agents = 512
ppo = PPO_en(7, 0, 6, testing=True, fid_threshold=0.0, ham_noisy=True,
             run_until_told_to_stop=True, run_until_completion_its=10**12,
             landscape_exploration=True, save_topc=100,
             num_agents=agents, rollout_sweeps=4)
for pi_it, v_it, label in ((1, 1, "rollout-dominated (1/1 iters)"),
                           (200, 200, "full (200/200 iters)")):
    epoch_fn = ppo._build_epoch(500, 0.2, 3e-3, 1e-3, 1000, pi_it, v_it, 0.01)
    st = jax.vmap(ppo._init_agent)(jax.random.split(jax.random.key(0), agents))
    for _ in range(2):
        st, out = epoch_fn(st); fetch(out.rewards)
    t0 = time.perf_counter(); n_ep = 3
    for _ in range(n_ep):
        st, out = epoch_fn(st); fetch(out.rewards)
    dt = (time.perf_counter() - t0) / n_ep
    print(f"{label}: {dt*1e3:.1f} ms/epoch -> {agents*500/dt/1e3:.0f}k steps/s")
