"""The model zoo: controller-search optimizers + RL controller synthesis.

Registry mirrors the reference's model database
(noise_analysis.py:126-131): {"ppo", "lbfgs", "snob", "adam", "nmplus"}.
"""

from code_robchar_tpu.models.lbfgs import LBFGS
from code_robchar_tpu.models.adam import Adam
from code_robchar_tpu.models.nmplus import NMPlus
from code_robchar_tpu.models.snob import SNOB
from code_robchar_tpu.models.ppo import PPO_en
# exact-SNOBFIT adapter: import is safe without skquant (the dependency
# check happens at construction); NOT in the registry — the reference's
# model database has exactly five names (noise_analysis.py:126-131)
from code_robchar_tpu.models.snob_skquant import SNOBSkquant

MODEL_REGISTRY = {
    "ppo": PPO_en,
    "lbfgs": LBFGS,
    "snob": SNOB,
    "adam": Adam,
    "nmplus": NMPlus,
}

__all__ = ["LBFGS", "Adam", "NMPlus", "SNOB", "PPO_en", "SNOBSkquant",
           "MODEL_REGISTRY"]
