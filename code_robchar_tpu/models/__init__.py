"""The model zoo: controller-search optimizers + RL controller synthesis.

Registry mirrors the reference's model database
(noise_analysis.py:126-131): {"ppo", "lbfgs", "snob", "adam", "nmplus"}.
"""

from code_robchar_tpu.models.lbfgs import LBFGS
from code_robchar_tpu.models.adam import Adam
from code_robchar_tpu.models.nmplus import NMPlus
from code_robchar_tpu.models.snob import SNOB
from code_robchar_tpu.models.ppo import PPO_en

MODEL_REGISTRY = {
    "ppo": PPO_en,
    "lbfgs": LBFGS,
    "snob": SNOB,
    "adam": Adam,
    "nmplus": NMPlus,
}

__all__ = ["LBFGS", "Adam", "NMPlus", "SNOB", "PPO_en", "MODEL_REGISTRY"]
