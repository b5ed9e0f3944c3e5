"""Siamese train-step throughput on one chip (reference geometry).

The reference trains DenseNet121+head at batch 4, 357x256, on a single
GPU, with host-side albumentations (siamese/config.py:92,114-115); it
publishes no throughput number. This records ours: the full jitted
train step — device-side augmentation (positive = augmented anchor),
three-branch forward, backward, optax update — at the reference's
image geometry, head-only (reference default) and backbone-unfrozen.

Protocol: batches ride to the device once; steps are chained through
their donated carries (params/opt_state feed the next step, so the
device stream serializes them — no readback between steps); one loss
readback drains the queue; tiny-op RTT subtracted. Compile the exact
program timed (warmup step == timed step).

    python benchmarks/train_step_throughput.py [--steps 10]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

IMAGE_SIZE = (352, 256)  # reference trains at 357x256 (cropped to /32)


def bench_config(backbone: str, freeze: bool, batch: int, loss: str,
                 steps: int, rtt: float, compute_dtype: str = "bf16") -> None:
    import jax
    import jax.numpy as jnp
    import jax.random as jrandom

    from image_search_engine_tpu.training.siamese.config import SiameseConfig
    from image_search_engine_tpu.training.siamese.train import Trainer

    cfg = SiameseConfig(
        backbone=backbone, image_size=IMAGE_SIZE, embedding_dim=128,
        batch_size=batch, freeze_backbone=freeze, loss=loss,
        compute_dtype=compute_dtype,
    )
    trainer = Trainer(cfg)
    rng = np.random.default_rng(0)
    h, w = IMAGE_SIZE
    anchors = jnp.asarray(rng.random((batch, h, w, 3)), jnp.float32)
    negatives = jnp.asarray(rng.random((batch, h, w, 3)), jnp.float32)

    p, bs, opt = trainer.params, trainer.batch_stats, trainer.opt_state
    key = jrandom.PRNGKey(0)
    # compile + one warm step (donation consumes p/bs/opt; keep the carries)
    p, bs, opt, loss_v = trainer._train_step(p, bs, opt, key, anchors, negatives)
    _ = float(loss_v)  # forces completion (device_get drains the stream)

    t0 = time.time()
    for i in range(steps):
        p, bs, opt, loss_v = trainer._train_step(
            p, bs, opt, jrandom.PRNGKey(i + 1), anchors, negatives)
    loss_f = float(loss_v)  # one readback drains the chained steps
    el = max((time.time() - t0 - rtt) / steps, 1e-9)
    tag = "frozen backbone (head-only)" if freeze else "unfrozen backbone"
    print(f"{backbone} {tag} loss={loss} batch={batch} {compute_dtype}: "
          f"{el*1e3:.1f} ms/step -> {batch/el:.1f} img/s "
          f"(loss {loss_f:.4f})", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu"
    tiny = jax.jit(lambda v: v + 1.0)
    _ = np.asarray(tiny(jnp.zeros((8, 128))))
    t0 = time.time()
    for _ in range(3):
        _ = np.asarray(tiny(jnp.zeros((8, 128))))
    rtt = (time.time() - t0) / 3
    print(f"tunnel RTT {rtt*1e3:.0f} ms", flush=True)

    # reference operating point: densenet121 head-only, triplet —
    # bf16 vs f32 compute at the same geometry (the compute_dtype claim)
    for dt in ("bf16", "f32"):
        bench_config("densenet121", True, 32, "triplet", args.steps, rtt,
                     compute_dtype=dt)
    bench_config("densenet121", True, 128, "triplet", args.steps, rtt)
    # full fine-tune (the expensive mode the reference gates behind a
    # ~16 min XLA compile note, siamese_tf/train.py:86-87), both precisions
    for dt in ("bf16", "f32"):
        bench_config("densenet121", False, 32, "triplet", args.steps, rtt,
                     compute_dtype=dt)
    # circle loss variant (PT flavor)
    bench_config("densenet121", True, 32, "circle", args.steps, rtt)


if __name__ == "__main__":
    main()
