"""Test configuration: run everything on a virtual 8-device CPU mesh.

The environment variables must be set before jax initializes its backends,
hence this lives at the very top of conftest and sets them unconditionally.

Set ``MMDIFF_TEST_PLATFORM=tpu`` to run on the real chip instead (used to
validate Pallas kernel numerics on actual Mosaic rather than interpret
mode — e.g. ``MMDIFF_TEST_PLATFORM=tpu pytest tests/test_block_attention.py``).
Device-count assertions and mesh tests are skipped there.
"""

import os
import sys

_TPU = os.environ.get("MMDIFF_TEST_PLATFORM") == "tpu"

if not _TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    # Keep the TPU plugin's boot-time registration out of test subprocesses
    # (multihost tests spawn fresh interpreters): with the pool var cleared,
    # sitecustomize skips axon registration entirely, so CPU test runs can't
    # hang on an unreachable device tunnel.
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    # CPU-intent processes skip the persistent compile cache by default
    # (utils/cache.py: XLA:CPU AOT reloads always warn about tuning
    # pseudo-features); for repeated local pytest runs the warnings are
    # cosmetic and heavy compile reuse matters, so the suite opts back in.
    os.environ.setdefault("MMDIFF_CPU_CACHE", "1")
if not _TPU:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if not _TPU:
    # The environment's TPU plugin ignores JAX_PLATFORMS; force CPU explicitly.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

if not _TPU:
    assert len(jax.devices()) == 8, jax.devices()
