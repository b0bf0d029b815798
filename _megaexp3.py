"""Bisect _winner_point internals."""
import sys, time
def log(*a): print(*a, flush=True)
VARIANT = sys.argv[1]; B = int(sys.argv[2])
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
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
    seeds = sd[:]
    o3 = (ox[:], oy[:], oz[:]); d3 = (dx[:], dy[:], dz[:])
    zeros = jnp.zeros((8, 128), jnp.float32)
    rad3 = (zeros, zeros, zeros)
    for b in range(B):
        i_best = mk._mt_closest(pk_ref, o3, d3, cfg.t_max, False, T_pad)
        hit = i_best >= 0
        at = mk._gather_attrs(tableT, i_best)
        if VARIANT == "uv":
            pvec = mk._cross3(d3, at.e2)
            det = mk._dot3(at.e1, pvec)
            dvalid = jnp.abs(det) > 1e-10
            inv_det = jnp.where(dvalid, 1.0 / jnp.where(dvalid, det, 1.0), 0.0)
            tvec = mk._sub3(o3, at.v0)
            u = mk._dot3(tvec, pvec) * inv_det
            rad3 = mk._add3(rad3, (u*1e-3, u*1e-3, u*1e-3))
        elif VARIANT == "tfull":
            pvec = mk._cross3(d3, at.e2)
            det = mk._dot3(at.e1, pvec)
            dvalid = jnp.abs(det) > 1e-10
            inv_det = jnp.where(dvalid, 1.0 / jnp.where(dvalid, det, 1.0), 0.0)
            tvec = mk._sub3(o3, at.v0)
            u = mk._dot3(tvec, pvec) * inv_det
            qvec = mk._cross3(tvec, at.e1)
            v = mk._dot3(d3, qvec) * inv_det
            t = mk._dot3(at.e2, qvec) * inv_det
            valid = dvalid & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) & (t > 0.0)
            t = jnp.where(valid, t, mk._BIG)
            t = jnp.where(hit, t, 0.0)
            rad3 = mk._add3(rad3, (t*1e-3, u*1e-3, v*1e-3))
        elif VARIANT == "norm":
            u = zeros + 0.3; v = zeros + 0.3
            w = 1.0 - u - v
            normal = mk._normalize3((
                u * at.n1[0] + v * at.n2[0] + w * at.n0[0],
                u * at.n1[1] + v * at.n2[1] + w * at.n0[1],
                u * at.n1[2] + v * at.n2[2] + w * at.n0[2]))
            rad3 = mk._add3(rad3, mk._scale3(normal, 1e-3))
        elif VARIANT == "chain":
            # feed gather output back into next bounce's ray (the real
            # dataflow: d3 depends on previous bounce's everything)
            d3 = mk._normalize3(mk._add3(d3, mk._scale3(at.kd, 1e-3)))
            rad3 = mk._add3(rad3, mk._scale3(at.kd, 1e-3))
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
