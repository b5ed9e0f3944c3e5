"""Does the persistent compilation cache engage over this backend?

Run TWICE in fresh processes (the point is cross-process reuse):

    python benchmarks/compile_cache_probe.py --dir /tmp/ise_cc_probe
    python benchmarks/compile_cache_probe.py --dir /tmp/ise_cc_probe

First run: compiles, should WRITE cache entries. Second run: should HIT
(compile wall collapses and jax's persistent-cache hit metric fires).
Validated working on CPU (tests/test_compile_cache.py); over the axon
REMOTE-compile tunnel the result is the open question this script
answers — BENCH_NOTES.md "Persistent compilation cache".

Pass --vary to append the PID to a constant so every run compiles a
DIFFERENT program (negative control: must never hit).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/ise_cc_probe")
    ap.add_argument("--vary", action="store_true")
    args = ap.parse_args()

    from image_search_engine_tpu.utils import compile_cache

    ok = compile_cache.enable(args.dir, min_compile_secs=0.0)

    import numpy as np
    import jax
    import jax.numpy as jnp

    salt = float(os.getpid() % 97) if args.vary else 0.12345

    @jax.jit
    def f(a, b):
        # distinctive shape+constant so no unrelated program matches
        return jnp.tanh(a @ b + salt).sum(axis=1)

    a = jnp.zeros((1536, 640), jnp.bfloat16)
    b = jnp.zeros((640, 896), jnp.bfloat16)
    t0 = time.time()
    _ = np.asarray(f(a, b))
    wall = time.time() - t0

    hits = -1
    try:
        from jax._src.monitoring import get_event_count

        hits = get_event_count("/jax/compilation_cache/cache_hits")
    except Exception:
        pass
    d = Path(args.dir).expanduser()
    entries = len(list(d.iterdir())) if d.is_dir() else 0
    print(f"cache_enabled={ok} backend={jax.default_backend()} "
          f"compile+run={wall:.2f}s cache_hits={hits} entries={entries}",
          flush=True)


if __name__ == "__main__":
    main()
