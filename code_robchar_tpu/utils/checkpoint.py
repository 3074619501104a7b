"""Training-state checkpointing (orbax) + the JSON respawn story.

The reference's checkpoint/resume is three JSON mechanisms (SURVEY.md §5):
experiment-cell respawn, fcall-checkpointed controller sets, and
filename-keyed analysis caches — all reproduced in exp/ and mc/.  This
module adds what the reference lacks: durable *training-state* checkpoints
(PPO agent pytrees, optimizer stream states) via orbax, so long controller
searches survive preemption on real fleets.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_state(path: str, state: Any) -> str:
    """Save a pytree checkpoint (orbax if available, else pickle)."""
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, jax.device_get(state), force=True)
        ckptr.wait_until_finished()
    except Exception:
        import pickle
        with open(path + ".pkl", "wb") as f:
            pickle.dump(jax.device_get(state), f)
        return path + ".pkl"
    return path


def restore_state(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree checkpoint saved by save_state."""
    path = os.path.abspath(path)
    if os.path.exists(path + ".pkl"):
        import pickle
        with open(path + ".pkl", "rb") as f:
            return pickle.load(f)
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, target=jax.device_get(template))
    return ckptr.restore(path)
