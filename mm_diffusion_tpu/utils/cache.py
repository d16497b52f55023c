"""Persistent XLA compilation cache setup.

Compiling through a remote device transport (axon tunnel) costs minutes per
program; the persistent cache makes warm starts ~instant across processes.
Called by all CLI entry points.

The cache directory is keyed by a host-CPU signature: XLA:CPU AOT results
record the compile machine's feature set, and loading an entry compiled on
a different microarchitecture only WARNS ("could lead to execution errors
such as SIGILL") before executing it anyway.  Sessions migrate between
heterogeneous hosts, so a shared directory eventually serves poisoned
binaries; keying by CPU flags makes each microarchitecture populate its
own cache."""

import hashlib
import os
import platform

import jax


def _cpu_signature() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:10]
    except OSError:
        pass
    return platform.machine()


DEFAULT_DIR = os.path.expanduser(f"~/.cache/jax_comp_{_cpu_signature()}")


def enable_compilation_cache(cache_dir: str = DEFAULT_DIR):
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
