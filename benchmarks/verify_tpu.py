"""Compiled-on-TPU correctness artifact.

The CI suite runs every kernel in interpret mode on CPU
(tests/conftest.py); this script is the durable record that the SAME
code paths, Mosaic-COMPILED on a real TPU chip, match the pure-XLA
brute-force oracle. It renders each backend compiled (no interpret) and
writes the max |err| per config to benchmarks/VERIFY_TPU.md.

Run: PYTHONPATH=. python benchmarks/verify_tpu.py   (on a TPU host)
"""

import os
import sys
import time

import jax
import jax.numpy as jnp


# Linear-radiance error budget (VERDICT round-3 ask #5): mean |err| and
# the fraction of entries beyond ERR_TOL. A raw max-err criterion is not
# robust for a path tracer at depth: Mosaic's float reordering can flip
# a KNIFE-EDGE per-path decision (a pdf/validity compare at ~1 ulp) on
# isolated lanes, changing that pixel by a whole path contribution —
# measured 1 pixel in 262144 at 9 bounces (mean err 4e-6). The max
# column is still reported.
MEAN_TOL = 1e-4
ERR_TOL = 1e-3
FRAC_TOL = 1e-4


def render_lin(scene, camera, cfg, accel=None):
    import mini_opencl_raytracer_tpu as mrt
    out = mrt.render_radiance(scene, camera, cfg, frames=1, accel=accel)
    return jax.block_until_ready(out)


def main() -> int:
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import dataclasses

    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu.models import procedural
    from mini_opencl_raytracer_tpu.render import resolve_backend

    dev = jax.devices()[0]
    rows = []

    def check(name, scene, camera, cfg, backends, oracle_backend="bruteforce"):
        oracle = render_lin(scene, camera,
                            dataclasses.replace(cfg,
                                                backend=oracle_backend))
        for b in backends:
            c = dataclasses.replace(cfg, backend=b)
            resolved = resolve_backend(scene, c)
            accel = mrt.build_accel(scene, c)
            t0 = time.perf_counter()
            img = render_lin(scene, camera, c, accel=accel)
            dt = time.perf_counter() - t0
            err = jnp.abs(img - oracle)
            mx = float(jnp.max(err))
            mean = float(jnp.mean(err))
            frac = float(jnp.mean(err > ERR_TOL))
            ok = ("PASS" if mean <= MEAN_TOL and frac <= FRAC_TOL
                  else "FAIL")
            rows.append((name, f"{b} ({resolved})", mx, mean, frac, ok,
                         dt))
            print(f"{name:34s} {b:10s} -> {resolved:9s} "
                  f"max={mx:.2e} mean={mean:.2e} frac>{ERR_TOL:.0e}="
                  f"{frac:.1e} {ok}", flush=True)

    camera = mrt.Camera.default()
    cornell = mrt.cornell_scene()

    cfg = mrt.RenderConfig(width=512, height=512, bounces=9)
    check("cornell 512x512 9b", cornell, camera, cfg,
          ["bvh", "pallas", "mega"])

    cfg_sh = mrt.RenderConfig(width=512, height=512, bounces=4,
                              shadow_rays=True, direct_specular=True,
                              specular_model="ggx")
    check("cornell 512x512 shadows+ggx", cornell, camera, cfg_sh,
          ["bvh", "pallas", "mega"])

    # Large-scene row: exercises the cluster-culled streaming kernel
    # (T > 2048 routes `pallas` to it). Sized so the all-pairs oracle
    # and the pure-JAX bvh path still compile on-chip — XLA batches
    # their per-ray table accesses into [R, T_pad, 3] HBM broadcasts
    # (see ops/bvh._intersect_one), which caps the compiled oracle at
    # a few thousand triangles; the kernel itself serves 260k+
    # (benchmarks/RESULTS.md config 5).
    bunny = procedural.bunny_scene(target_tris=4000)
    cfg_b = mrt.RenderConfig(width=128, height=128, bounces=2)
    check("bunny-4k 128x128 2b (clustered)", bunny, camera, cfg_b,
          ["bvh", "pallas"])

    path = os.path.join(os.path.dirname(__file__), "VERIFY_TPU.md")
    with open(path, "w") as f:
        f.write("# Compiled-on-TPU verification\n\n")
        f.write(f"Device: {dev.device_kind}; oracle: `bruteforce` "
                f"backend (pure XLA, no Pallas), same chip,\n"
                f"compiled (no interpret). Linear-radiance errors per "
                f"backend; PASS = mean <= {MEAN_TOL:.0e} AND\n"
                f"frac(|err| > {ERR_TOL:.0e}) <= {FRAC_TOL:.0e}. Raw "
                f"max is reported but not gated: compiled float\n"
                f"reordering can flip a knife-edge path decision on "
                f"isolated lanes (measured 1 px / 262144\nat 9 bounces)"
                f" — see the module docstring.\n\n")
        f.write("| Config | Backend | max | mean | frac>"
                f"{ERR_TOL:.0e} | status | s/frame |\n")
        f.write("|---|---|---|---|---|---|---|\n")
        for name, b, mx, mean, frac, ok, dt in rows:
            f.write(f"| {name} | {b} | {mx:.2e} | {mean:.2e} | "
                    f"{frac:.1e} | {ok} | {dt:.2f} |\n")
    print(f"wrote {path}")
    return 0 if all(r[5] == "PASS" for r in rows) else 1


if __name__ == "__main__":
    sys.exit(main())
