"""Scene data models: geometry, materials, camera, lights, loaders."""

from .scene import (Camera, Geometry, Lights, Materials, Scene,
                    LIGHT_DIRECTIONAL, LIGHT_POINT, LIGHT_SPOT)
