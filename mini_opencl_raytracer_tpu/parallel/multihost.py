"""Multi-host initialization (DCN) for pod-slice rendering.

The reference has no distribution at all (SURVEY.md section 5). Multi-host
here is the standard JAX recipe: ``jax.distributed.initialize`` discovers
peers (TPU pods auto-configure from the metadata server; CPU/GPU test
rigs pass coordinator/num_processes/process_id explicitly), after which
``jax.devices()`` spans the slice and the meshes from parallel/mesh.py
lay dp/tp axes so that tp (ring ppermute traffic) rides ICI within a
host/slice and dp crosses DCN only at image assembly.

Tests stub this with single-process multi-device meshes
(``xla_force_host_platform_device_count``), per SURVEY.md section 4.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if running multi-host.

    No-ops (returns False) when single-process: explicit args absent and
    no cluster env (TPU metadata / JAX_COORDINATOR_ADDRESS) detected.
    Safe to call multiple times.
    """
    global _initialized
    if _initialized:
        return True
    env_coord = os.environ.get("JAX_COORDINATOR_ADDRESS")
    on_tpu_pod = (os.environ.get("TPU_WORKER_HOSTNAMES") is not None
                  or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
                  is not None)
    if coordinator_address is None and env_coord is None and not on_tpu_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def process_info():
    """(process_index, process_count, local_device_count)."""
    return (jax.process_index(), jax.process_count(),
            jax.local_device_count())
