"""Smoke tests for examples/ (VERDICT r4 weak #3): the reference-notebook
parity artifacts (SURVEY §2.1 "Notebooks") are the first thing a user
runs — drive each end to end in a subprocess so they break when the APIs
they demo change.

Each example runs under a tiny wrapper that forces the CPU backend
programmatically BEFORE first JAX use (the axon sitecustomize pins
JAX_PLATFORMS=axon and ignores env overrides — CLAUDE.md gotcha; the
examples themselves stay TPU-first, so the override lives here, not in
them), then runpy-executes the real script with the real argv.
"""

import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

REPO = Path(__file__).resolve().parent.parent

_WRAPPER = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import runpy

script = sys.argv[1]
sys.argv = [script] + sys.argv[2:]
runpy.run_path(script, run_name="__main__")
"""


def _run_example(script: str, args, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "-c", _WRAPPER, str(REPO / "examples" / script),
         *args],
        cwd=str(REPO), env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stdout}"
    return proc.stdout


def test_quickstart_example():
    out = _run_example("quickstart.py", ["--method", "dnn"])
    # the example queries with corpus image 0: a sane retrieval result is
    # that image ranked first at ~0 distance
    lines = [ln for ln in out.splitlines() if ln.startswith("  ") and ".png" in ln]
    assert lines, f"no result lines:\n{out}"
    dist, path = lines[0].split(None, 1)
    assert float(dist) < 0.05, f"self-match distance {dist}:\n{out}"
    assert "querying with " + path.strip() in out.replace("querying with", "querying with"), out
    assert path.strip().endswith("g0_0.png"), out


def test_scale_out_example():
    out = _run_example("scale_out.py", [])
    assert "mesh: 8 x cpu" in out, out
    for section in ("sharded flat:", "sharded IVF:", "sharded IVF-PQ:",
                    "exact rerank(32)"):
        assert section in out, f"missing {section!r}:\n{out}"
    # flat self-queries must self-match (q = x[:4] + tiny noise)
    flat_line = next(ln for ln in out.splitlines() if "sharded flat:" in ln)
    assert "[0, 1, 2, 3]" in flat_line, flat_line


def test_siamese_workflow_example(tmp_path):
    rng = np.random.default_rng(3)
    for split, n in (("train", 8), ("valid", 4)):
        d = tmp_path / split
        d.mkdir()
        for i in range(n):
            img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"card_{split}_{i}.png")
    out = _run_example(
        "siamese_workflow.py",
        ["--train-dir", str(tmp_path / "train"),
         "--valid-dir", str(tmp_path / "valid"),
         "--epochs", "1", "--backbone", "densenet-tiny",
         "--image-size", "64", "64"],
    )
    assert "best val loss:" in out, out
    recall_line = next(
        ln for ln in out.splitlines() if "flat-vs-bruteforce recall" in ln)
    recall = float(recall_line.rsplit(":", 1)[1])
    # the faiss-vs-dict oracle (reference test_index.py:49-71): both paths
    # rank the same embeddings, so agreement must be near-perfect
    assert recall >= 0.9, recall_line
