"""Persistent compilation cache (utils/compile_cache.py).

Validated in subprocesses: ``jax_compilation_cache_dir`` is process-global
config that must be set before the first compile, so enabling it inside
the main test process would poison every other test. Two fresh CPU
processes compile the same program against one cache dir — the first
populates it, the second must hit it (observed via JAX's own
``persistent_cache_hit_count`` metric).
"""

import os
import subprocess
import sys

_WORKER = r"""
import sys
import jax

jax.config.update("jax_platforms", "cpu")

from image_search_engine_tpu.utils import compile_cache

ok = compile_cache.enable(sys.argv[1], min_compile_secs=0.0)
assert ok, "enable() failed"

import numpy as np
import jax.numpy as jnp


@jax.jit
def f(a, b):
    return jnp.tanh(a @ b + 0.625).sum(axis=1)


out = np.asarray(f(jnp.ones((64, 32)), jnp.ones((32, 48))))
assert out.shape == (64,)

from jax._src import monitoring
try:
    from jax._src.monitoring import get_event_count  # jax>=0.4.34-ish
    hits = get_event_count("/jax/compilation_cache/cache_hits")
except Exception:
    hits = -1  # metric API unavailable; fall back to dir contents only
print(f"cache_hits={hits}", flush=True)
"""


def _run(cache_dir):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, "-c", _WORKER, str(cache_dir)],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=240,
    )
    assert p.returncode == 0, f"worker failed:\n{p.stdout}\n{p.stderr}"
    return p.stdout


def test_cache_populates_and_hits(tmp_path):
    cache_dir = tmp_path / "xla"
    out1 = _run(cache_dir)
    entries = list(cache_dir.iterdir())
    assert entries, "first process wrote no cache entries"
    assert "cache_hits=0" in out1 or "cache_hits=-1" in out1

    out2 = _run(cache_dir)
    # second fresh process: either the hit metric fires or, where the
    # metric API is unavailable, the entry count must not grow (the
    # program was served from the cache, not recompiled+rewritten)
    if "cache_hits=-1" in out2:
        assert len(list(cache_dir.iterdir())) == len(entries)
    else:
        hits = int(out2.split("cache_hits=")[1].split()[0])
        assert hits >= 1, f"expected a persistent-cache hit, got:\n{out2}"


def test_enable_bad_path_warns_not_raises(tmp_path):
    """A broken cache location must never block serving."""
    from image_search_engine_tpu.utils import compile_cache

    blocker = tmp_path / "file"
    blocker.write_text("x")
    # path exists as a FILE -> mkdir fails -> enable returns False
    assert compile_cache.enable(blocker / "sub") is False
