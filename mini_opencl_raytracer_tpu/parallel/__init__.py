"""Multi-chip distribution: device meshes, sharded rendering, multi-host."""
