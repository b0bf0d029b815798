"""Pallas TPU intersection kernels (placeholder — implemented in
ops/pallas/panel.py; this module wires backends together)."""

from __future__ import annotations

from ...config import RenderConfig
from ...models.scene import Geometry


def make_intersectors(geometry: Geometry, cfg: RenderConfig):
    from . import panel
    return panel.make_intersectors(geometry, cfg)
