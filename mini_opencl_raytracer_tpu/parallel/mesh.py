"""Device-mesh construction for sharded rendering.

All new capability — the reference is strictly single-device (one OpenCL
queue, CLutils.cpp:29; SURVEY.md section 2 'Parallelism inventory'). The
mesh has two named axes:

* ``dp`` — data parallel over pixels/tiles (the direct analog of the
  reference's one-work-item-per-pixel launch, CLRaytracer.cpp:53-54,
  spread over chips instead of threads);
* ``tp`` — geometry parallel: triangle buffers sharded across chips,
  rays ring-passed between shards (parallel/shard.py).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (dp, tp) mesh over the given (default: all) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    tp = max(cfg.tp, 1)
    if n % tp:
        raise ValueError(f"device count {n} not divisible by tp={tp}")
    dp = cfg.dp or n // tp
    if dp * tp != n:
        devices = devices[: dp * tp]
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (cfg.dp_axis, cfg.tp_axis))


def single_device_mesh(cfg: MeshConfig = MeshConfig()) -> Mesh:
    """1x1 mesh (for code paths that always go through shard_map)."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1),
                (cfg.dp_axis, cfg.tp_axis))
