"""DCN (multi-process) smoke test: two CPU processes join one
``jax.distributed`` job through ``parallel.mesh.init_multihost``, build a
global mesh spanning both processes' devices, and run a psum — the
cross-host collective path SURVEY.md §2.3 mandates (the ICI half is
covered by the in-process 8-device mesh everywhere else).

Spawned as real subprocesses (jax.distributed state is process-global and
would poison the main test process). Skips, with the reason recorded, on
sandboxes that forbid the coordinator's localhost socket.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
from image_search_engine_tpu.parallel.mesh import init_multihost, make_mesh

n = init_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert n == 2, f"expected 2 global devices, got {n}"
assert jax.process_count() == 2

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

mesh = make_mesh()  # spans BOTH processes' devices
assert mesh.devices.size == 2

# one global psum over the DCN mesh: each process contributes its local
# shard; every process must see the global sum
x = jax.make_array_from_callback(
    (2, 4),
    NamedSharding(mesh, P("data", None)),
    lambda idx: jnp.full((1, 4), float(pid + 1)),
)


def f(v):
    return jax.lax.psum(jnp.sum(v, axis=0), "data")


out = jax.jit(
    jax.shard_map(f, mesh=mesh, in_specs=P("data", None), out_specs=P(),
                  check_vma=False)
)(x)
got = jax.device_get(out)
assert got.tolist() == [3.0, 3.0, 3.0, 3.0], got
print(f"proc {pid}: psum ok {got.tolist()}", flush=True)
"""


def test_two_process_dcn_psum(tmp_path):
    import socket

    # pick a free port for the coordinator
    with socket.socket() as s:
        try:
            s.bind(("127.0.0.1", 0))
        except OSError as e:
            pytest.skip(f"sandbox forbids localhost sockets: {e}")
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # 1 device per process, not the virtual 8
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, str(port), str(pid)],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("DCN smoke timed out (coordinator handshake)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "psum ok [3.0, 3.0, 3.0, 3.0]" in out
