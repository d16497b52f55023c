"""Persistent XLA compilation cache setup.

Compiling through a remote device transport (axon tunnel) costs minutes per
program; the persistent cache makes warm starts ~instant across processes.
Called by all CLI entry points."""

import os

import jax

DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp")


def enable_compilation_cache(cache_dir: str = DEFAULT_DIR):
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
