"""Multihost (DCN) dress rehearsal: two real OS processes initialize
jax.distributed against a localhost coordinator, build a GLOBAL 2-device mesh
(one CPU device per process) and run a psum-sharded computation across it —
the exact mechanism behind `impx.train.train --multihost`
(train.py:148-151 -> jax.distributed.initialize; reference train.py:49-53
uses torch DDP process groups for the same role)."""
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize pins axon; override

pid = int(sys.argv[1])
port = sys.argv[2]
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2, jax.devices()  # global view: 1 per process

import jax.numpy as jnp
import numpy as np
from jax.experimental import multihost_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# cross-process allgather over DCN
got = multihost_utils.process_allgather(jnp.asarray([float(pid + 1)]))
np.testing.assert_allclose(np.asarray(got).ravel(), [1.0, 2.0])

# data-parallel psum over the global mesh (the train step's reduction)
mesh = Mesh(np.asarray(jax.devices()), ("data",))
sharding = NamedSharding(mesh, P("data"))
local = jnp.full((1, 4), float(pid + 1))
garr = jax.make_array_from_single_device_arrays(
    (2, 4), sharding, [jax.device_put(local, jax.local_devices()[0])])


@jax.jit
def total(x):
    return jnp.sum(x)


out = float(total(garr))  # fully-replicated scalar: fetchable on any host
assert out == (1.0 + 2.0) * 4, out
print(f"MULTIHOST_OK {pid} {out}", flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = str(s.getsockname()[1])

    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ, XLA_FLAGS="", JAX_PLATFORMS="cpu")
    procs = [subprocess.Popen([sys.executable, str(script), str(i), port],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True, env=env)
             for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail(f"multihost workers hung; partial output: {outs}")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"MULTIHOST_OK {i}" in out, out
