"""Multi-host initialization and host-0 gating (SURVEY §2.3, §5).

The reference is single-process/single-GPU; its TPU-native replacement
scales the same program to N hosts: ``jax.distributed.initialize`` makes
every host see the global device set, the view mesh spans all chips
(ICI within a slice, DCN across), and only host 0 performs disk IO /
logging. The jitted steps are unchanged — collectives come from the
sharding annotations.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    auto: Optional[bool] = None,
) -> bool:
    """Initialize jax.distributed when a multi-process env is configured.

    Three modes, in precedence order:
    1. Explicit args / standard env vars (JAX_COORDINATOR_ADDRESS +
       JAX_NUM_PROCESSES>1 [+ JAX_PROCESS_ID]).
    2. ``auto=True`` or ``TOPO4D_MULTIHOST=auto`` — a bare
       ``jax.distributed.initialize()`` (TPU pods self-configure from the
       cluster environment); a configuration failure raises, it does NOT
       silently fall back to per-host single-process mode (which would
       make every host believe it is host 0).
    3. Neither — single-process no-op, returns False.

    Safe to call twice (second call is a no-op).
    """
    if getattr(initialize_multihost, "_done", False):
        return getattr(initialize_multihost, "_distributed", False)
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if auto is None:
        auto = os.environ.get("TOPO4D_MULTIHOST", "").lower() == "auto"
    distributed = False
    if coordinator_address is not None and (num_processes or 0) > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        distributed = True
    elif auto:
        try:
            jax.distributed.initialize()
        except Exception as exc:
            raise RuntimeError(
                "TOPO4D_MULTIHOST=auto requested but jax.distributed "
                "auto-configuration failed (not a recognized cluster "
                f"environment?): {exc}"
            ) from exc
        distributed = jax.process_count() > 1
    initialize_multihost._done = True
    initialize_multihost._distributed = distributed
    return distributed


def is_host0() -> bool:
    """Whether this process should own disk IO / logging / checkpoints."""
    return jax.process_index() == 0


def host0_print(*args, **kwargs) -> None:
    if is_host0():
        print(*args, **kwargs)
