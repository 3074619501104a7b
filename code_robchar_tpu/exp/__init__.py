"""Experiment orchestration: naming, drivers, checkpoint/respawn, CLI."""

from code_robchar_tpu.exp.namer import ExperimentNamer
from code_robchar_tpu.exp.experiment import Experiment

__all__ = ["ExperimentNamer", "Experiment"]
