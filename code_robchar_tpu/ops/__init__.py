"""Numeric kernels: spin-chain Hamiltonians, propagators, gradients, noise."""

from code_robchar_tpu.ops.chain import (
    xx_hamiltonian,
    xx_hamiltonian_real,
    basis_state,
    control_projectors,
)
from code_robchar_tpu.ops.realform import (
    jacobi_eigh_sym,
    jacobi_eigh_herm,
    fidelity_sym,
    fidelity_herm,
    fidelity_from_controller_sym,
    infidelity_and_gradient_sym,
)
from code_robchar_tpu.ops.propagate import (
    propagator,
    transfer_fidelity,
    fidelity_from_controller,
    infidelity_and_gradient,
    overlap_ss,
)
from code_robchar_tpu.ops.noise import (
    structured_perturbation,
    directional_perturbation,
    shot_noise_fidelity,
    adaptive_shot_fidelity,
    fixed_hamiltonian_ensemble,
)

__all__ = [
    "xx_hamiltonian",
    "xx_hamiltonian_real",
    "jacobi_eigh_sym",
    "jacobi_eigh_herm",
    "fidelity_sym",
    "fidelity_herm",
    "fidelity_from_controller_sym",
    "infidelity_and_gradient_sym",
    "basis_state",
    "control_projectors",
    "propagator",
    "transfer_fidelity",
    "fidelity_from_controller",
    "infidelity_and_gradient",
    "overlap_ss",
    "structured_perturbation",
    "directional_perturbation",
    "shot_noise_fidelity",
    "adaptive_shot_fidelity",
    "fixed_hamiltonian_ensemble",
]
