"""Experiment orchestration: naming, drivers, checkpoint/respawn, CLI."""

from code_robchar_tpu.exp.namer import ExperimentNamer

__all__ = ["ExperimentNamer"]
