"""PPO trainer tests: record protocol, fcall accounting, learning signal."""

import numpy as np

from code_robchar_tpu.models import PPO_en


def test_ppo_budget_mode_and_topc():
    ppo = PPO_en(3, 0, 2, testing=True, fid_threshold=0.0,
                 run_until_told_to_stop=True, run_until_completion_its=200,
                 landscape_exploration=True, save_topc=20, max_time=30)
    best = ppo.run(steps_per_epoch=64, train_pi_iters=3, train_v_iters=3)
    assert 0 <= best <= 1 + 1e-9
    # budget stop with per-step resolution: func_calls lands on the budget
    assert ppo.record["func_calls"] + 1 >= 200
    assert ppo.record["func_calls"] <= 200
    assert "controllers" in ppo.record
    assert 1 <= len(ppo.record["controllers"]) <= 20
    # controllers have the (biases..., time) layout
    assert len(ppo.record["controllers"][0]) == 4


def test_ppo_threshold_mode():
    ppo = PPO_en(3, 0, 2, testing=True, fid_threshold=0.05,
                 run_until_told_to_stop=False)
    best = ppo.run(steps_per_epoch=64, train_pi_iters=2, train_v_iters=2,
                   epochs=50)
    assert best >= 0.05
    assert ppo.record["controller"] is not None
    assert ppo.record["func_calls"] > 0


def test_ppo_multi_agent_vmap():
    ppo = PPO_en(3, 0, 2, testing=True, fid_threshold=0.0,
                 run_until_told_to_stop=True, run_until_completion_its=400,
                 landscape_exploration=True, save_topc=10, num_agents=4)
    best = ppo.run(steps_per_epoch=32, train_pi_iters=2, train_v_iters=2)
    assert 0 <= best <= 1 + 1e-9
    assert len(ppo.record["controllers"]) >= 1


def test_ppo_fixed_ham_fcall_multiplier():
    ppo = PPO_en(3, 0, 2, testing=True, fid_threshold=0.0,
                 run_until_told_to_stop=True, run_until_completion_its=3200,
                 landscape_exploration=True, save_topc=5,
                 use_fixed_ham=True, opt_train_size=8)
    ppo.run(steps_per_epoch=32, train_pi_iters=2, train_v_iters=2)
    # each env step bills train_size calls (ppo.py:365-366)
    assert ppo.record["func_calls"] % 8 == 0
