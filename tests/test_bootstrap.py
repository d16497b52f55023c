"""Exercise the multi-host bootstrap for real: a 2-process CPU rendezvous
(r1 VERDICT item 36 — `setup_dist` was never exercised anywhere).

Each subprocess gets 2 virtual CPU devices; after `setup_dist` both must see
4 global devices, and a psum across the global mesh must produce the
all-process sum — the SPMD equivalent of the reference's
MASTER_ADDR/NCCL rendezvous (dist_util.py:18-52).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from mm_diffusion_tpu.parallel import setup_dist

pid = int(sys.argv[1])
setup_dist(coordinator_address=sys.argv[2], num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

mesh = Mesh(np.array(jax.devices()).reshape(4), ("data",))
# global array [4] sharded one element per device; psum-equivalent reduction
def cb(idx):
    n = idx[0].stop - idx[0].start
    return np.full((n,), float(pid + 1), np.float32)
x = jax.make_array_from_callback((4,), NamedSharding(mesh, P("data")), cb)
total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
# procs contribute [1,1,2,2] -> 6
val = float(jax.device_get(total))
assert abs(val - 6.0) < 1e-6, val
print(f"proc{pid} OK global_sum={val}")
"""


@pytest.mark.slow
def test_two_process_cpu_rendezvous(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_PLATFORM_NAME"] = "cpu"
    env.pop("JAX_DIST_INITIALIZED", None)
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags + ["--xla_force_host_platform_device_count=2"])
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(pid), coord],
            env=env, cwd=repo, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc{pid} failed:\n{out[-2000:]}"
        assert f"proc{pid} OK" in out


def test_setup_dist_raises_on_explicit_failure():
    """Explicit multi-process args + failed rendezvous must raise, not
    silently downgrade to 1/N-of-the-data training."""
    from mm_diffusion_tpu.parallel import setup_dist

    os.environ.pop("JAX_DIST_INITIALIZED", None)
    with pytest.raises(Exception):
        # unroutable coordinator, tiny timeout via env is not available —
        # invalid port format fails fast in argument validation
        setup_dist(coordinator_address="definitely:not:an:address",
                   num_processes=2, process_id=0)
