"""The cachable Monte-Carlo robustness engine."""

from code_robchar_tpu.mc.engine import (
    mc_fidelity_sweep,
    mc_metric_sweep,
    metric_tensors,
    arim_from_rims,
    characterise,
)
from code_robchar_tpu.mc.datasim import MCDataSim, remove_redundant_ticks

__all__ = [
    "mc_fidelity_sweep",
    "mc_metric_sweep",
    "metric_tensors",
    "arim_from_rims",
    "characterise",
    "MCDataSim",
    "remove_redundant_ticks",
]
