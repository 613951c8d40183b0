"""Multi-host (multi-slice) utilities.

reference equivalents: Accelerate process-group setup (trainer.py:63-68),
`split_between_processes` (eval_infer_batch.py:187), `wait_for_everyone`
barriers. TPU-native: jax.distributed for DCN coordination; GSPMD handles
all intra-slice communication.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize wrapper (no-op on single host)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes, process_id=process_id)


def split_between_processes(items: Sequence, pad: bool = False):
    """Contiguous per-host split of a work list (Accelerate semantics:
    contiguous chunks, last host may get fewer; pad=True repeats the last
    item so every host gets equal work)."""
    pc, pi = jax.process_count(), jax.process_index()
    n = len(items)
    per = -(-n // pc)
    chunk = list(items[pi * per : (pi + 1) * per])
    if pad and chunk and len(chunk) < per:
        chunk += [chunk[-1]] * (per - len(chunk))
    return chunk


def barrier(name: str = "barrier") -> None:
    """Cross-host barrier (wait_for_everyone equivalent)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast_from_host0(x: np.ndarray) -> np.ndarray:
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(x))
