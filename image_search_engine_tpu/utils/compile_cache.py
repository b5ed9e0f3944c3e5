"""Persistent XLA compilation cache for the CLI entry points.

Cold-start is compile-bound: the reference pays model-load seconds, but
here every jitted program XLA-compiles on first use — measured 471 s for
an engine prewarm (resnet-tiny embed + search) through the dev tunnel,
and 2-5 min per Pallas kernel. JAX's persistent compilation cache stores
compiled executables on disk keyed by (program, compiler options, device
kind), so a RESTARTED indexer/engine skips straight past compilation
(verified: cache hit loads the fused serving executable in 0.14 s).
Note the prewarm wall time also includes the FIRST DISPATCH of each
program — milliseconds on local hardware, but through a remote-compile
tunnel that term can still take minutes regardless of the cache
(BENCH_NOTES "End-to-end verify at HEAD"); the engine logs the
compile-vs-dispatch split at startup.

Enabled by the indexer and engine CLIs (opt out with
--no-compile-cache); library imports never touch global JAX config.
"""

from __future__ import annotations

import logging
import os
from pathlib import Path
from typing import Optional

log = logging.getLogger(__name__)

DEFAULT_DIR = "~/.cache/image_search_engine_tpu/xla"


def enable(path: Optional[str | Path] = None,
           min_compile_secs: float = 0.5) -> bool:
    """Point JAX's persistent compilation cache at ``path`` (default
    ``$ISE_COMPILE_CACHE`` or ~/.cache/image_search_engine_tpu/xla).

    Must run before the first compilation. Returns True if enabled;
    failures only warn — a broken cache must never block serving.
    ``min_compile_secs`` skips caching trivial compiles (0 caches all).
    """
    import jax

    p = Path(path or os.environ.get("ISE_COMPILE_CACHE", DEFAULT_DIR)).expanduser()
    try:
        p.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(p))
        # default 0.5 s still caches every program that matters here:
        # through the remote-compile tunnel real compiles are minutes
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
        log.info("persistent compilation cache at %s", p)
        return True
    except Exception as e:  # noqa: BLE001
        log.warning("compilation cache unavailable (%s); compiles stay "
                    "per-process", e)
        return False
