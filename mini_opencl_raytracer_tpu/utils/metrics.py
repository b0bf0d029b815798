"""Timing / throughput metrics.

Replaces the reference's clock()-based FPS counter (CLEngineBase.cpp:
193-196, shown at CLui.cpp:196-197) with a block_until_ready timing
harness and structured per-frame metrics (SURVEY.md section 5).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def time_fn(f: Callable[..., Any], iters: int = 5, warmup: int = 1) -> float:
    """Median wall-clock seconds per call, synchronized on device output.

    Rig realities shape this harness (all observed on the remote-TPU
    tunnel):
    * ``jax.block_until_ready`` can return BEFORE the execution that
      fills the output (measured 0.2 ms "frames" of 30 ms of real
      work), so each iteration synchronizes by fetching the first
      output leaf to the HOST — the only reliable barrier here.
      Callers should return a scalar (e.g. the image mean) so the
      fetch is tiny; a single XLA executable completes atomically, so
      one leaf's arrival covers the whole output.
    * repeated executions with bit-identical arguments can be served
      from a cache — so ``f`` is called with the iteration index,
      which callers should feed into the computation (e.g. as the
      frame seed). Zero-arg callables are accepted for convenience.
    Median over iters is robust to the rig's transient slow windows.
    """
    import inspect

    import numpy as np

    takes_arg = True
    try:
        inspect.signature(f).bind(0)
    except TypeError:
        takes_arg = False
    call = (lambda i: f(i)) if takes_arg else (lambda i: f())

    def sync(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    for w in range(warmup):
        sync(call(1_000_000 + w))
    times = []
    for i in range(iters):
        t0 = time.perf_counter()
        sync(call(i))
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2]


def scan_frames(f: Callable[[Any], Any], inner: int) -> Callable[[Any], Any]:
    """Fold ``inner`` distinct frames of a jittable scalar-returning
    ``f(frame_u32)`` into ONE jitted executable (a ``lax.scan`` over
    frame indices summing the scalars) — the rig-proof timing shape.

    The tunneled-TPU rig adds a per-dispatch round-trip whose floor was
    measured at 2.5-33 ms for the SAME 512x512 frame hours apart
    (benchmarks/RESULTS.md round-4 footnote); timing per-call therefore
    measures the tunnel in bad windows, not the kernel. One scanned call
    runs ``inner`` frames per host round-trip, so the rig tax amortizes
    to noise — the analog of the reference timing its frame loop, not
    its dispatch (CLEngineBase.cpp:193-196).

    ``f`` must return a scalar that DEPENDS on all work to be timed
    (e.g. the mean image, or the sum of every gradient leaf) so nothing
    is dead-code-eliminated; frames inside the scan use consecutive
    distinct frame numbers starting at the call's base argument.

    ``data``: optional pytree of device arrays ``f`` needs (scene,
    accel, ...), passed as a REAL jit argument — large arrays must not
    ride in as closure constants, or they get embedded in the HLO
    payload itself (the tunneled remote compiler rejects such programs
    outright: HTTP 413 at sponza scale). With ``data``, ``f`` is called
    as ``f(frame, data)``.
    """
    def batched(base, data=None):
        def body(c, k):
            fr = jnp.uint32(base) + k
            return c + (f(fr) if data is None else f(fr, data)), None
        tot, _ = jax.lax.scan(
            body, jnp.zeros((), jnp.float32),
            jnp.arange(inner, dtype=jnp.uint32))
        return tot

    return jax.jit(batched)


def time_scan_fn(f: Callable[..., Any], inner: int = 8, iters: int = 5,
                 warmup: int = 1, data: Any = None) -> float:
    """Median seconds per FRAME of ``f`` (see ``scan_frames``): each
    timed sample is one host-synchronized call executing ``inner``
    distinct frames, divided by ``inner``. Distinct bases per sample keep
    every frame's arguments unique (identical-argument calls can be
    served cached on this rig). ``data`` is forwarded per scan_frames.

    NOTE: the result still contains per-call-round-trip/inner — use
    time_scan_slope for numbers that must exclude the rig constant."""
    batched = scan_frames(f, inner)
    sec = time_fn(
        lambda i: batched(jnp.asarray((7919 * (i + 1)) & 0xFFFFFFFF,
                                      jnp.uint32), data),
        iters=iters, warmup=warmup)
    return sec / inner


def time_scan_slope(f: Callable[..., Any], inner_lo: int = 8,
                    inner_hi: int = 40, iters: int = 5,
                    data: Any = None) -> float:
    """Marginal seconds per frame of ``f``: the SLOPE between two scan
    lengths, median over ``iters`` interleaved (lo, hi) pairs.

    The tunneled rig charges every dispatch a round-trip constant that
    was measured anywhere from 2.5 to 33 ms within hours on the SAME
    workload — at small frames it dominates any per-call measurement
    (a 0.16 ms 512x512 frame timed 4.5 ms at inner=8). Timing the same
    scanned program at two lengths and taking
    (T_hi - T_lo) / (inner_hi - inner_lo) cancels the constant exactly
    and keeps everything real a frame costs (kernel launches included);
    interleaving the lo/hi samples inside one process also guards
    against the rig's multi-x slow-window drift, which breaks any
    A-then-B comparison across minutes. This matches the reference's
    timing of its frame LOOP rather than its dispatch path
    (CLEngineBase.cpp:193-196).
    """
    b_lo = scan_frames(f, inner_lo)
    b_hi = scan_frames(f, inner_hi)
    import time as _time

    import numpy as np

    def sync(out):
        np.asarray(jax.tree_util.tree_leaves(out)[0])

    def run(b, base):
        t0 = _time.perf_counter()
        sync(b(jnp.asarray(base & 0xFFFFFFFF, jnp.uint32), data))
        return _time.perf_counter() - t0

    # Warm both programs (compile + first-run effects).
    run(b_lo, 7)
    run(b_hi, 11)
    slopes = []
    for i in range(iters):
        t_lo = run(b_lo, 7919 * (2 * i + 1))
        t_hi = run(b_hi, 7919 * (2 * i + 2))
        slopes.append((t_hi - t_lo) / (inner_hi - inner_lo))
    slopes.sort()
    return slopes[len(slopes) // 2]


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
