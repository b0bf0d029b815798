"""Small vector-math helpers over [..., 3] arrays.

Replaces the reference's ``float3`` operator library (CLmathlib.hpp:18-118)
with broadcasting ``jnp`` helpers. Everything is shape-polymorphic over
leading batch dimensions so the same code serves one ray or a [H*W] grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot(a: jax.Array, b: jax.Array) -> jax.Array:
    """Batched dot product over the trailing axis -> [...]."""
    return jnp.sum(a * b, axis=-1)


def cross(a: jax.Array, b: jax.Array) -> jax.Array:
    return jnp.cross(a, b)


def length(a: jax.Array) -> jax.Array:
    return jnp.sqrt(jnp.maximum(dot(a, a), 0.0))


def normalize(a: jax.Array, eps: float = 1e-20) -> jax.Array:
    """Safe normalize; returns a zero-safe unit vector."""
    return a * jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))[..., None]


def reflect(v: jax.Array, n: jax.Array) -> jax.Array:
    """Reference convention (kernel_bvh.cl:74-77): reflect the *outgoing*
    vector, ``-v + 2 (v.n) n`` (note: NOT the GLSL reflect sign)."""
    return -v + 2.0 * dot(v, n)[..., None] * n


def build_onb(n: jax.Array):
    """Orthonormal basis (s, t, n) matching SampleHemisphereCosine's frame
    (kernel_bvh.cl:85-87): axis = |n.x|>0.001 ? +Y : +X;
    t = normalize(cross(axis, n)); s = cross(n, t)."""
    use_y = (jnp.abs(n[..., 0]) > 1e-3)[..., None]
    axis = jnp.where(
        use_y,
        jnp.array([0.0, 1.0, 0.0], n.dtype),
        jnp.array([1.0, 0.0, 0.0], n.dtype),
    )
    t = normalize(cross(axis, n))
    s = cross(n, t)
    return s, t


def spherical_dir(s: jax.Array, t: jax.Array, n: jax.Array,
                  phi: jax.Array, sin_theta: jax.Array,
                  cos_theta: jax.Array) -> jax.Array:
    """Direction from local spherical angles in the (s, t, n) frame
    (kernel_bvh.cl:89, 238)."""
    return normalize(
        s * (jnp.cos(phi) * sin_theta)[..., None]
        + t * (jnp.sin(phi) * sin_theta)[..., None]
        + n * cos_theta[..., None]
    )
