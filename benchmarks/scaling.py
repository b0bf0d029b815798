"""DP scaling measurement (BASELINE.md scaling-efficiency row).

    python benchmarks/scaling.py --cpu     # 8 virtual CPU devices
    python benchmarks/scaling.py           # real devices (1 on this rig)

Strong scaling of one progressive sample over the ``dp`` mesh axis
(parallel/shard.render_sample_dp): fixed image, pixels sharded over
1/2/4/8 devices. Writes benchmarks/SCALING.md.

Caveat recorded in the table: with ``--cpu`` the virtual devices are
xla_force_host_platform_device_count slices of ONE host CPU, which XLA
already multithreads at dp=1 — observed speedups are therefore a lower
bound that validates the sharded program (it compiles, runs, and matches
the single-device image) rather than a hardware scaling claim. Real
multi-chip scaling rides the same code path over ICI (zero collectives
until image assembly — the sharded axis IS the output layout).
"""

from __future__ import annotations

import json
import os
import sys

if "--cpu" in sys.argv:
    import re
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+",
                       "--xla_force_host_platform_device_count=8", flags)
    else:
        flags = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.environ["XLA_FLAGS"] = flags

import numpy as np
import jax
import jax.numpy as jnp

if "--cpu" in sys.argv:
    # The TPU sitecustomize hook snapshots JAX_PLATFORMS before this
    # script runs; config.update post-import is authoritative
    # (tests/conftest.py uses the same sequence).
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu.config import MeshConfig
from mini_opencl_raytracer_tpu.parallel.shard import render_sample_dp
from mini_opencl_raytracer_tpu.utils.metrics import time_fn
from jax.sharding import Mesh


def main() -> int:
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    scene = mrt.cornell_scene()
    cam = mrt.Camera.default()
    n_dev = len(jax.devices())
    backend = "bvh" if jax.default_backend() == "cpu" else "auto"
    cfg = mrt.RenderConfig(width=256, height=256, bounces=2,
                           backend=backend)
    rays = cfg.num_pixels * cfg.bounces

    import dataclasses
    # Two resolutions per dp: t(R) = F + V*R separates the per-sample
    # FIXED cost F (dispatch, mesh collective setup, image assembly)
    # from the VARIABLE per-ray cost V. Strong-scaling efficiency on V
    # alone is the communication-free upper bound the fixed overhead
    # hides (the dp render has zero collectives until assembly).
    cfg_small = dataclasses.replace(cfg, width=128, height=128)
    rays_small = cfg_small.num_pixels * cfg_small.bounces

    rows = []
    ref_img = None
    for dp in [1, 2, 4, 8]:
        if dp > n_dev:
            break
        mesh_cfg = MeshConfig(dp=dp, tp=1)
        mesh = Mesh(np.asarray(jax.devices()[:dp]).reshape(dp, 1),
                    (mesh_cfg.dp_axis, mesh_cfg.tp_axis))
        f = jax.jit(lambda s: render_sample_dp(s, cam, cfg, mesh,
                                               mesh_cfg=mesh_cfg))
        fs = jax.jit(lambda s: render_sample_dp(s, cam, cfg_small, mesh,
                                                mesh_cfg=mesh_cfg))
        img = np.asarray(f(scene))
        if ref_img is None:
            ref_img = img
        else:
            np.testing.assert_allclose(img, ref_img, rtol=1e-4, atol=1e-4)
        sec = time_fn(lambda: f(scene), iters=5)
        sec_s = time_fn(lambda: fs(scene), iters=5)
        # t = F + V * rays  ->  solve from the two workloads.
        V = (sec - sec_s) / (rays - rays_small)
        F = sec - V * rays
        rows.append({"dp": dp, "ms": sec * 1e3, "ms_small": sec_s * 1e3,
                     "fixed_ms": F * 1e3, "var_ms": V * rays * 1e3,
                     "mrays_per_s": rays / sec / 1e6})
        print(json.dumps(rows[-1]), flush=True)

    base = rows[0]["ms"]
    base_var = rows[0]["var_ms"]
    path = os.path.join(os.path.dirname(__file__), "SCALING.md")
    with open(path, "w") as f:
        f.write("# DP strong-scaling (render_sample_dp)\n\n")
        f.write(f"Platform: {jax.default_backend()} "
                f"({n_dev} devices), {cfg.width}x{cfg.height} Cornell, "
                f"{cfg.bounces} bounces, backend={backend}.\n\n")
        if jax.default_backend() == "cpu":
            f.write("Virtual-device caveat: all dp shards share one host "
                    "CPU that XLA already multithreads at dp=1, so the "
                    "speedup column is a validation lower bound, not a "
                    "hardware scaling claim (see module docstring).\n\n")
        f.write("Fixed/variable split per dp from two resolutions "
                f"({cfg_small.width}^2 and {cfg.width}^2): t = F + V*R. "
                "`var eff` is strong-scaling\nefficiency of the "
                "variable (per-ray) part alone — the communication-free "
                "upper bound\nthe fixed per-sample overhead hides.\n\n")
        f.write("| dp | ms/sample | fixed ms | variable ms | Mrays/s | "
                "speedup | efficiency | var eff |\n")
        f.write("|---|---|---|---|---|---|---|---|\n")
        for r in rows:
            sp = base / r["ms"]
            spv = base_var / max(r["var_ms"], 1e-9)
            f.write(f"| {r['dp']} | {r['ms']:.1f} | {r['fixed_ms']:.1f} "
                    f"| {r['var_ms']:.1f} | {r['mrays_per_s']:.1f} | "
                    f"{sp:.2f}x | {sp / r['dp'] * 100:.0f}% | "
                    f"{spv / r['dp'] * 100:.0f}% |\n")
        f.write("\nSharded images match the dp=1 image to 1e-4 at every "
                "dp (asserted during the run).\n")
    print(f"wrote {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
