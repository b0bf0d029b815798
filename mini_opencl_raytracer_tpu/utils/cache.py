"""Persistent XLA compilation cache helper.

Cold-process compilation of the render graphs costs minutes (dominated by
backend first-compile latency); the persistent cache drops repeat runs to
milliseconds. Enabled by the CLI, bench harness, and test suite.
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.expanduser("~/.cache/jax_comp_cache")


def enable_persistent_cache(path: str = _DEFAULT) -> str:
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
