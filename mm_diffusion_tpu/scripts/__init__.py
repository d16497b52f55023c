"""CLI entry points (reference parity: py_scripts/*.py).

Platform-intent guard: environments whose TPU PJRT plugin registers at
interpreter boot may override ``jax_platforms`` (e.g. to "axon,cpu") after
the env var was read, so an explicit ``JAX_PLATFORMS=cpu`` launch would
still try to initialize the TPU client — and hang every CLI when the
device tunnel is unreachable.  Re-asserting the env var's value here (all
scripts import through this package before touching any jax device) makes
the user's explicit choice stick; runs without JAX_PLATFORMS set are
unaffected.
"""

import os

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
