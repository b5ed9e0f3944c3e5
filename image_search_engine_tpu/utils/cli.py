"""Shared CLI plumbing for the indexer/engine entry points.

One definition of the scale-out and compile-cache flags so they cannot
drift between commands (they previously lived copy-pasted in both
parse_args bodies).
"""

from __future__ import annotations

import argparse


def add_scaleout_args(ap: argparse.ArgumentParser, verb: str) -> None:
    """--sharded / --dcn-* / --no-compile-cache, shared by indexer+engine.

    ``verb`` names the action in help text ("serve"/"build").
    """
    ap.add_argument("--sharded", type=int, nargs="?", const=0, default=None,
                    metavar="N",
                    help=f"{verb} over a 1-D mesh of the first N local "
                         "devices (no N = all); the multi-chip layout "
                         "(parallel/)")
    ap.add_argument("--dcn-coordinator", default=None, metavar="HOST:PORT",
                    help="join a multi-host (DCN) job before meshing — "
                         "process 0's address; give all three --dcn-* on "
                         "every process, or '--dcn-coordinator auto' on a "
                         "TPU pod")
    ap.add_argument("--dcn-processes", type=int, default=None)
    ap.add_argument("--dcn-process-id", type=int, default=None)
    ap.add_argument("--no-compile-cache", action="store_true",
                    help="disable the persistent XLA compilation cache "
                         "(utils/compile_cache.py; with it on, restarts "
                         "skip recompilation)")


def apply_scaleout_args(a: argparse.Namespace) -> dict:
    """Side effects (compile cache) + the Config kwargs for the flags."""
    if not a.no_compile_cache:
        from image_search_engine_tpu.utils import compile_cache

        compile_cache.enable()
    return dict(
        shard_devices=a.sharded, dcn_coordinator=a.dcn_coordinator,
        dcn_num_processes=a.dcn_processes, dcn_process_id=a.dcn_process_id,
    )
