"""Pallas backend dispatch: flat panel kernel for small scenes,
cluster-culled kernel (HBM-resident triangles + packet descent) for
large ones."""

from __future__ import annotations

from ...config import RenderConfig
from ...models.scene import Geometry

# Above this triangle count the all-pairs panel sweep loses to the
# cluster-culled kernel (and its VMEM-resident packing stops fitting).
FLAT_PANEL_MAX_TRIS = 2048


def make_intersectors(geometry: Geometry, cfg: RenderConfig, accel=None,
                      materials=None):
    T = geometry.v0.shape[0]
    if T <= FLAT_PANEL_MAX_TRIS:
        from . import panel
        return panel.make_intersectors(geometry, cfg)
    from . import clustered
    return clustered.make_intersectors(geometry, cfg, accel=accel,
                                       materials=materials)


def build_accel(geometry: Geometry, cfg: RenderConfig, materials=None):
    """Host-side acceleration build for the pallas backend (SAH clusters
    via the native builder for big scenes; small scenes need none).
    ``materials`` lets the accel carry shading rows so closest hits
    return winner attributes in-traversal (clustered.build_accel)."""
    T = geometry.v0.shape[0]
    if T <= FLAT_PANEL_MAX_TRIS:
        return None
    from . import clustered
    return clustered.build_accel(geometry, materials=materials)
