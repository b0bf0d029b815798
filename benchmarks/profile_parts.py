"""Component ablation of the fused bounce kernels (TPU only).

Monkeypatches individual stages of the megakernel to no-ops and times
the forward / backward kernels after each cut, isolating where the
device time actually goes. Diagnostic tool — wrong images by design.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(__file__), '..'))
import time

import jax
import jax.numpy as jnp


def timeit(fn, iters=5):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    import mini_opencl_raytracer_tpu as mrt
    from mini_opencl_raytracer_tpu.ops.pallas import megakernel as mk

    W, H, B = 1920, 1080, 9
    scene = mrt.cornell_scene()
    cfg = mrt.RenderConfig(width=W, height=H, bounces=B, backend="auto")

    R = W * H
    n_rows = -(-R // mk._LANES)
    n_rows = -(-n_rows // mk._ROWS) * mk._ROWS
    key = jax.random.PRNGKey(0)
    o = jax.random.normal(key, (3, n_rows, mk._LANES), jnp.float32)
    d = jax.random.normal(jax.random.PRNGKey(1),
                          (3, n_rows, mk._LANES), jnp.float32)
    beta = jnp.ones((3, n_rows, mk._LANES), jnp.float32)
    aliveF = jnp.ones((n_rows, mk._LANES), jnp.float32)
    seeds = jnp.arange(n_rows * mk._LANES, dtype=jnp.uint32).reshape(
        n_rows, mk._LANES)
    cms = mk._bounce_cms(0)
    tableT = mk.build_mega_table(scene.geometry, scene.materials)
    lv = mk.pack_lights(scene.lights)
    mt = mk.build_mt_table(scene.geometry)
    idx = jnp.zeros((n_rows, mk._LANES), jnp.int32)
    occ = jnp.zeros((n_rows, mk._LANES), jnp.int32)
    cot = (o, d, beta, o)
    n_res = mk._num_resid_rows(cfg, lv.shape[0])
    resid = (jnp.full((n_res, n_rows, mk._LANES), 0.5, jnp.float32)
             if cfg.bwd_residuals else None)

    def fwd_fn():
        @jax.jit
        def f(o, d, beta, aliveF):
            out = o
            oo, dd, bb, af = o, d, beta, aliveF
            for _ in range(B):
                no, nd, nbeta, naf, rad, i, oc = mk._run_bounce_fwd(
                    tableT, lv, mt, oo, dd, bb, af, seeds, cms, cfg)
                out = out + rad
                oo, dd, bb, af = no, nd, nbeta, naf
            return out
        return timeit(lambda: f(o, d, beta, aliveF))

    def bwd_fn():
        @jax.jit
        def f(o, d, beta, aliveF):
            acc = o
            oo, dd, bb = o, d, beta
            for _ in range(B):
                d_o, d_d, d_beta, d_tab, d_lv = mk._run_bounce_bwd(
                    tableT, lv, oo, dd, bb, aliveF, seeds, idx, occ,
                    cms, resid, cot, cfg)
                acc = acc + d_o
                oo, dd, bb = d_o, d_d, d_beta
            return acc, d_tab, d_lv
        return timeit(lambda: f(o, d, beta, aliveF))

    results = {}

    def run(tag):
        tf, tb = fwd_fn(), bwd_fn()
        results[tag] = (tf, tb)
        print(f"{tag:28s} fwd {tf*1e3/B:6.2f} ms/bounce   "
              f"bwd {tb*1e3/B:6.2f} ms/bounce", flush=True)

    run("full")

    # --- cut M-T (forward only component) -------------------------------
    orig_mt = mk._mt_closest
    mk._mt_closest = lambda g_ref, o3, d3, t_max, bc, T_pad: (
        jnp.zeros((mk._ROWS, mk._LANES), jnp.int32))
    run("no M-T")
    mk._mt_closest = orig_mt

    # --- cut gather ------------------------------------------------------
    orig_gather = mk._gather_attrs
    def fake_gather(tableT, i_best):
        z = jnp.zeros((mk._ROWS, mk._LANES), jnp.float32) + tableT[0, 0]
        c3 = (z, z + 0.3, z + 0.7)
        return mk._Attrs(v0=c3, e1=c3, e2=c3, n0=c3, n1=c3, n2=c3,
                         kd=c3, ks=c3, ke=c3, ns=z + 2.0)
    mk._gather_attrs = fake_gather
    run("no gather")
    mk._gather_attrs = orig_gather

    # --- cut BRDF sampling ----------------------------------------------
    orig_brdf = mk._sample_brdf
    def fake_brdf(wo, normal, kd, ks, ns, seeds, cms, sp, specular_model,
                  kn=None):
        n_emit = 14 if specular_model != "ggx" else 13
        if kn is not None and kn.writing:
            for _ in range(n_emit):
                kn.emit(jnp.zeros_like(normal[0]))
        elif kn is not None:
            for _ in range(n_emit):
                kn.take()
        return normal, kd, normal[0] * 0.1 + 0.5, normal[0] > -2.0
    mk._sample_brdf = fake_brdf
    run("no BRDF sample")
    mk._sample_brdf = orig_brdf

    # --- cut direct light ------------------------------------------------
    orig_dl = mk._direct_light
    def fake_dl(lv, num_lights, pos, normal, wo, ns, ds, shadow_fn=None,
                occ_bits=None, shadow_eps=1e-2, kn=None):
        nl = int(num_lights)
        if kn is not None and kn.writing:
            for _ in range(nl):
                kn.emit(jnp.zeros_like(pos[0]))
        elif kn is not None:
            for _ in range(nl):
                kn.take()
        z = pos[0] * 0.0
        return z + lv[0, 0], z, jnp.zeros_like(pos[0], dtype=jnp.int32)
    mk._direct_light = fake_dl
    run("no direct light")
    mk._direct_light = orig_dl

    # --- cut winner-point recompute -------------------------------------
    orig_wp = mk._winner_point
    def fake_wp(at, o3, d3, hit, bc, kn=None):
        if kn is not None and kn.writing:
            kn.emit(jnp.zeros_like(o3[0]))
            kn.emit(jnp.zeros_like(o3[0]))
        elif kn is not None:
            kn.take(); kn.take()
        n = mk._normalize3(at.n0)
        return at.v0, n, o3[0] * 0.0, o3[0] * 0.0
    mk._winner_point = fake_wp
    run("no winner point")
    mk._winner_point = orig_wp

    full_f, full_b = results["full"]
    print("\ncomponent shares (ms/bounce):")
    for tag, (tf, tb) in results.items():
        if tag == "full":
            continue
        print(f"  {tag:26s} fwd {(full_f-tf)*1e3/B:6.2f}   "
              f"bwd {(full_b-tb)*1e3/B:6.2f}")


if __name__ == "__main__":
    main()
