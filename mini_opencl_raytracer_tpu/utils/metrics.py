"""Timing / throughput metrics.

Replaces the reference's clock()-based FPS counter (CLEngineBase.cpp:
193-196, shown at CLui.cpp:196-197) with a block_until_ready timing
harness and structured per-frame metrics (SURVEY.md section 5).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax


def time_fn(f: Callable[[], Any], iters: int = 5, warmup: int = 1) -> float:
    """Mean wall-clock seconds per call, synchronized on device output.

    Blocks on EVERY iteration: blocking only on the last output lets
    the async dispatch queue under-report small frames by orders of
    magnitude on the remote-TPU rig (observed 0.1 ms "frames" for work
    that takes 2.5 ms synchronized). The per-call dispatch overhead
    this adds (~0.1 ms) is part of the honest end-to-end frame time.
    """
    for _ in range(warmup):
        jax.block_until_ready(f())
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(f())
    return (time.perf_counter() - t0) / iters


def bounce_occupancy(scene, camera, cfg, frame: int = 0):
    """Per-bounce live-ray fractions [bounces] — wavefront occupancy
    observability (how much of each bounce's lockstep work is wasted on
    dead lanes). Runs the jnp integrator with stats on the configured
    wavefront backend."""
    import jax.numpy as jnp

    from ..ops import rng
    from ..ops.camera import generate_rays
    from ..ops.integrator import trace_paths
    from ..render import make_intersectors

    closest, any_hit = make_intersectors(scene, cfg)
    pix = jnp.arange(cfg.num_pixels, dtype=jnp.uint32)
    seeds = rng.pixel_seeds(pix, jnp.uint32(frame))
    o, d = generate_rays(camera, cfg, pix, seeds)
    _, stats = trace_paths(scene, cfg, o, d, seeds, closest, any_hit,
                           with_stats=True)
    return stats


def render_metrics(seconds_per_frame: float, width: int, height: int,
                   bounces: int, spp: int = 1) -> Dict[str, float]:
    """Structured throughput record for one render configuration.

    'rays' counts one ray per pixel per bounce per sample — the direct
    extension of the reference's work-item-per-pixel workload
    (CLRaytracer.cpp:53) to multi-bounce batches.
    """
    rays = width * height * bounces * spp
    return {
        "seconds_per_frame": seconds_per_frame,
        "fps": 1.0 / seconds_per_frame,
        "rays_per_frame": float(rays),
        "rays_per_second": rays / seconds_per_frame,
        "mrays_per_second": rays / seconds_per_frame / 1e6,
    }
