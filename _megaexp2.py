"""Bisect within _shade_bounce."""
import functools, sys, time
def log(*a): print(*a, flush=True)
VARIANT = sys.argv[1]; B = int(sys.argv[2])
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu.ops.pallas import megakernel as mk
from mini_opencl_raytracer_tpu.ops import rng
from mini_opencl_raytracer_tpu.ops.camera import generate_rays
log("imported", VARIANT, B)

scene = mrt.cornell_scene()
cam = mrt.Camera.default()
cfg = mrt.RenderConfig(width=128, height=8, bounces=B, backend="mega")
R = cfg.num_pixels
pix = jnp.arange(R, dtype=jnp.uint32)
seeds_h = rng.pixel_seeds(pix, jnp.uint32(0))
o, d = generate_rays(cam, cfg, pix, seeds_h)
tableT = mk.build_mega_table(scene.geometry, scene.materials)
lv = mk.pack_lights(scene.lights)
T_pad = tableT.shape[1]
packed = jnp.zeros((T_pad, 16), jnp.float32).at[:, :9].set(tableT[:9].T)

def kernel(tab_ref, pk_ref, lv_ref, ox, oy, oz, dx, dy, dz, sd, rx, ry, rz):
    tableT = tab_ref[:]
    lv = lv_ref[:]
    seeds = sd[:]
    o3 = (ox[:], oy[:], oz[:]); d3 = (dx[:], dy[:], dz[:])
    ones = jnp.ones((8, 128), jnp.float32)
    zeros = jnp.zeros((8, 128), jnp.float32)
    rad3 = (zeros, zeros, zeros)
    beta3 = (ones, ones, ones)
    alive = jnp.ones((8,128), bool)
    for b in range(B):
        i_best = mk._mt_closest(pk_ref, o3, d3, cfg.t_max, False, T_pad)
        hit = i_best >= 0
        at = mk._gather_attrs(tableT, i_best)
        pos, normal = mk._winner_point(at, o3, d3, hit, False)
        wo = mk._neg3(d3)
        if VARIANT == "point":
            rad3 = mk._add3(rad3, mk._scale3(normal, 1e-3))
            rad3 = mk._add3(rad3, mk._scale3(pos, 1e-4))
            d3 = tuple(c + 1e-6 for c in d3)
        elif VARIANT == "brdf":
            wi, f, pdf, valid = mk._sample_brdf(wo, normal, at.kd, at.ks,
                                                at.ns, seeds, b, 0.5)
            rad3 = mk._add3(rad3, mk._scale3(f, 1e-3))
            d3 = wi
        elif VARIANT == "lights":
            dl_diff, dl_spec = mk._direct_light(lv, 1, pos, normal, wo,
                                                at.ns, False)
            rad3 = mk._add3(rad3, mk._scale3(at.kd, dl_diff))
            d3 = tuple(c + 1e-6 for c in d3)
        elif VARIANT == "rngonly":
            u = mk._uniform(seeds, mk._bounce_site(b, 0))
            rad3 = mk._add3(rad3, (u*1e-3, u*1e-3, u*1e-3))
            d3 = tuple(c + 1e-6 for c in d3)
    rx[:] = rad3[0]; ry[:] = rad3[1]; rz[:] = rad3[2]

def panels(a, fill=0.0):
    return mk._to_panels(a, R, fill)
comps = [panels(o[:,0]), panels(o[:,1]), panels(o[:,2]),
         panels(d[:,0]), panels(d[:,1]), panels(d[:,2], 1.0),
         panels(seeds_h.astype(jnp.uint32))]
n_rows = comps[0].shape[0]
t0 = time.perf_counter()
out = pl.pallas_call(
    kernel,
    grid=(n_rows // 8,),
    in_specs=([mk._const_spec((mk._C_PAD, T_pad)), mk._const_spec((T_pad, 16)),
               mk._const_spec((1, mk._LCOLS))] + mk._ray_specs(7)),
    out_specs=tuple(mk._ray_specs(3)),
    out_shape=tuple(jax.ShapeDtypeStruct((n_rows, 128), jnp.float32) for _ in range(3)),
)(tableT, packed, lv, *comps)
jax.block_until_ready(out)
log("compile+run", time.perf_counter()-t0, float(out[0].mean()))
