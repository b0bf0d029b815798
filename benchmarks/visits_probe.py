"""Needed-visit analysis for the clustered kernel on the real
secondary-bounce wavefront (bunny 70k tris, 512x512).

Counts, per 2048-ray tile, how many cluster AABBs pass the slab test
(a) with t = inf (what a front-to-back-less kernel must visit) and
(b) with each lane bounded by its TRUE closest hit (the lower bound for
any packet scheme at this tile size — perfect occlusion culling).
The gap between the kernel's measured per-tile time and (b) x per-visit
cost locates the remaining headroom; round-5 measured the kernel within
~1.4x of (b), with per-visit cost sitting at the bottom of the
wasted-MXU-lanes vs scalar-sync U-curve (benchmarks/PROFILE.md).
"""
import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import jax, jax.numpy as jnp
from mini_opencl_raytracer_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import mini_opencl_raytracer_tpu as mrt
from mini_opencl_raytracer_tpu.models.procedural import bunny_scene
from mini_opencl_raytracer_tpu.ops import rng as rnglib
from mini_opencl_raytracer_tpu.ops.camera import generate_rays
from mini_opencl_raytracer_tpu.ops.integrator import (_ray_sort_keys,
    DEAD_KEY, park_point)
from mini_opencl_raytracer_tpu.ops.pallas import clustered
from mini_opencl_raytracer_tpu.render import _swizzled_ids

scene = bunny_scene()
geo = scene.geometry
cfg = mrt.RenderConfig(width=512, height=512)
accel = clustered.build_accel(geo, materials=scene.materials)
pts = jnp.concatenate([geo.v0, geo.v1, geo.v2], 0)
lo, hi = jnp.min(pts, 0), jnp.max(pts, 0)
cam = mrt.Camera.default()
ids = _swizzled_ids(cfg)
seeds = rnglib.pixel_seeds(ids, jnp.uint32(0))
o0, d0 = generate_rays(cam, cfg, ids, seeds)
h0 = clustered.intersect_clustered(o0, d0, accel, cfg.t_max)
import numpy as np
live = np.asarray(h0.hit)
print("live after bounce0:", live.mean())

# secondary wavefront, sorted + parked exactly like the integrator
def rnd(n, salt):
    h = rnglib.mix_u32(jnp.arange(n, dtype=jnp.uint32) + jnp.uint32(salt)*jnp.uint32(0x9E3779B9))
    return h.astype(jnp.float32)/4294967296.0
R = ids.shape[0]
u, v = rnd(R, 3), rnd(R, 11)
z = 2*u-1; r = jnp.sqrt(jnp.maximum(0,1-z*z)); phi = 2*jnp.pi*v
d1 = jnp.stack([r*jnp.cos(phi), r*jnp.sin(phi), z], -1)
pos = o0 + d0*jnp.where(h0.hit, h0.t, 1.0)[:, None]
o1 = pos + d1*1e-3
keys = jnp.where(h0.hit, _ray_sort_keys(o1, d1, lo, hi), jnp.uint32(DEAD_KEY))
out = jax.lax.sort((keys, o1[:,0],o1[:,1],o1[:,2], d1[:,0],d1[:,1],d1[:,2],
                    h0.hit.astype(jnp.int32)), num_keys=1)
os_ = jnp.stack(out[1:4], -1); ds_ = jnp.stack(out[4:7], -1); alv = out[7] > 0
park_o = park_point(lo, hi)
os_ = jnp.where(alv[:,None], os_, park_o[None,:])
ds_ = jnp.where(alv[:,None], ds_, jnp.full((3,), 1/np.sqrt(3), jnp.float32)[None,:])

# ground-truth closest t for per-lane perfect culling
h1 = clustered.intersect_clustered(os_, ds_, accel, cfg.t_max)
t_true = jnp.where(h1.hit, h1.t, jnp.float32(3e38))

cl = accel.cl_aabb  # [C_pad, 8]
C = cl.shape[0]
TILE = 2048
nt = R // TILE
def tile_counts(i, far):
    o = jax.lax.dynamic_slice_in_dim(os_, i*TILE, TILE)
    d = jax.lax.dynamic_slice_in_dim(ds_, i*TILE, TILE)
    tf = jax.lax.dynamic_slice_in_dim(far, i*TILE, TILE)
    eps=1e-20
    iv = 1.0/jnp.where(jnp.abs(d)>eps, d, eps)
    def slab(j):
        lo_ = cl[j,0:3][None,:]; hi_ = cl[j,3:6][None,:]
        t1 = (lo_-o)*iv; t2 = (hi_-o)*iv
        tmin = jnp.max(jnp.minimum(t1,t2),1); tmax = jnp.min(jnp.maximum(t1,t2),1)
        return jnp.any(jnp.minimum(tmax, tf) >= jnp.maximum(tmin,0.0))
    return jnp.sum(jax.vmap(slab)(jnp.arange(C)).astype(jnp.int32))
cnt_inf = jax.jit(lambda far: jnp.array([tile_counts(i, far) for i in range(nt)]))
big = jnp.full((R,), 3e38, jnp.float32)
a = np.asarray(cnt_inf(big)); b = np.asarray(cnt_inf(t_true))
print(f"clusters/tile at t=inf: mean {a.mean():.1f} max {a.max()}")
print(f"clusters/tile perfect-cull: mean {b.mean():.1f} max {b.max()}")
print(f"total clusters C={C}, tiles={nt}")
