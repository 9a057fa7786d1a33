"""Multi-host validation without a pod: two REAL processes wired through
``jax.distributed`` over loopback, each contributing 2 virtual CPU devices
to one 4-device global runtime. Exercises parallel/multihost.py's
initialize() and cross-process collectives (psum over the data axis) —
the part of SURVEY.md §5.8 round 1 could not reach.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
proc_id = int(sys.argv[1]); coord = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.getcwd())  # launched with cwd = repo root

import jax
# cross-process collectives on the CPU backend need gloo; 2 local devices
# per process -> 4 global
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_num_cpu_devices", 2)

from avsum_tpu.parallel.multihost import initialize, is_primary, local_batch_slice

initialize(coordinator_address=coord, num_processes=2, process_id=proc_id)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert is_primary() == (proc_id == 0)
assert local_batch_slice(8) == slice(proc_id * 4, proc_id * 4 + 4)

from avsum_tpu.parallel import MeshConfig, build_mesh
from avsum_tpu.parallel.mesh import AXIS_DATA

mesh = build_mesh(MeshConfig(data=4, seq=1, model=1, auto_data=False))

# cross-process collective: per-device ranks psum to the global sum
def body(x):
    return jax.lax.psum(x, AXIS_DATA)

fn = jax.jit(
    jax.shard_map(
        body, mesh=mesh, in_specs=P(AXIS_DATA), out_specs=P(AXIS_DATA)
    )
)
local = jax.process_index() * 2 + np.arange(2, dtype=np.float32)
global_x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(AXIS_DATA)), local, (4,)
)
out = fn(global_x)
local_out = np.concatenate([np.asarray(s.data) for s in out.addressable_shards])
np.testing.assert_allclose(local_out, 6.0)  # 0+1+2+3 everywhere
print(f"proc {proc_id}: psum OK", flush=True)
"""


@pytest.mark.slow
def test_two_process_loopback_psum(tmp_path):
    if os.environ.get("AVSUM_TEST_TPU"):
        pytest.skip("loopback multihost test is CPU-only")
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # the session's TPU plugin (on PYTHONPATH) hijacks backend init and
    # silently degrades 2-process CPU to two single-host runtimes
    env["PYTHONPATH"] = ""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # the worker resolves the repo from its own path; run it from the repo
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), coord],
            cwd=repo,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=180)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: psum OK" in out, out
