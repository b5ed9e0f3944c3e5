"""Siamese trainer: data-parallel metric learning with best-val
checkpointing and resume.

Covers both reference training loops with one implementation — the Keras
custom ``train_step`` SiameseModel (siamese_tf/model.py:154-180,
train.py:59-147) and the hand-rolled PT Trainer (siamese_pt/train.py) —
redesigned for TPU:

  * one jitted train step: device-side augmentation (positive = augmented
    anchor), shared-weight triple forward, triplet/circle loss, SGD
    (momentum 0.937, lr 1e-4 — reference hyperparameters);
  * data parallelism: the batch is sharded over the mesh's data axis and
    XLA inserts the gradient ``psum`` (SURVEY.md §2.3 — the only
    parallelism this model warrants);
  * checkpointing: best-val-loss gated, filename
    ``epoch_{e:02d}-loss_{v:.4f}.msgpack`` with latest-epoch resume and
    only-save-improvements threshold (reference ModelCheckpoint semantics,
    siamese_tf/train.py:113-120, and PT save_state, siamese_pt/train.py:
    45-71);
  * ReduceLROnPlateau(factor 0.5, patience 7) (siamese_tf/train.py:124-130)
    via optax inject_hyperparams;
  * metrics: JSONL lines + running means (the reference used TensorBoard +
    AverageMeter, siamese_pt/train.py:143-180);
  * KeyboardInterrupt-safe (siamese_tf/train.py:146-147).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from image_search_engine_tpu.training.siamese.augmentations import augment_batch
from image_search_engine_tpu.training.siamese.config import (
    SiameseConfig,
    ckpt_filename,
    extract_epoch_and_loss,
    get_best_val_loss,
    get_latest_checkpoint,
)
from image_search_engine_tpu.training.siamese.dataset import PairsGenerator
from image_search_engine_tpu.training.siamese.losses import (
    circle_loss,
    self_supervised_circle_loss,
    triplet_loss,
)
from image_search_engine_tpu.training.siamese.model import EmbeddingNet, apply_siamese

log = logging.getLogger(__name__)


class AverageMeter:
    """Running mean (reference siamese_pt/train.py:155-180).

    ``update`` accepts device scalars without forcing them: the sum chains
    lazily on the device stream, so the train loop never blocks on a
    per-step loss readback (30 ms RTT on a remote tunnel, and a pipeline
    barrier anywhere). ``avg`` performs the one synchronizing readback.
    """

    def __init__(self):
        self.sum = 0.0
        self.count = 0

    def update(self, value, n: int = 1) -> None:
        self.sum = self.sum + value * n
        self.count += n

    @property
    def avg(self) -> float:
        return float(self.sum) / max(self.count, 1)


_PREFETCH_DONE = object()


class Prefetcher:
    """Background-thread batch prefetch: the host decodes batch i+1 while
    the device runs step i (the reference leaned on tf.data/DataLoader
    workers for this; here one daemon thread + a bounded queue keeps the
    jitted step fed). ``stop()`` is interrupt-safe — the thread parks on
    bounded puts and re-checks the stop flag, so Ctrl-C never hangs."""

    def __init__(self, iterator, depth: int = 2):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()

        def put_checked(item) -> None:
            # every producer put is bounded + stop-flag-rechecked — the
            # end-of-iterator sentinel and error puts included, so stop()
            # after the queue fills never strands the thread
            while not self._stop.is_set():
                try:
                    self._q.put(item, timeout=0.25)
                    return
                except queue.Full:
                    continue

        def run():
            try:
                for item in iterator:
                    put_checked(item)
                    if self._stop.is_set():
                        return
                put_checked(_PREFETCH_DONE)
            except BaseException as e:  # surface decode errors to consumer
                put_checked(e)

        self._thread = threading.Thread(
            target=run, daemon=True, name="batch-prefetch")
        self._thread.start()

    def __iter__(self):
        return self

    def __next__(self):
        import queue

        # bounded get + stop-flag recheck: once stop() is set the producer
        # drops its sentinel/error puts, so an unbounded q.get() here could
        # block forever if another thread races stop() against this one
        while True:
            try:
                item = self._q.get(timeout=0.25)
                break
            except queue.Empty:
                if self._stop.is_set():
                    raise StopIteration from None
        if item is _PREFETCH_DONE:
            raise StopIteration
        if isinstance(item, BaseException):
            raise item
        return item

    def stop(self) -> None:
        self._stop.set()


def make_loss_fn(cfg: SiameseConfig):
    if cfg.loss == "triplet":
        return lambda a, p, n: jnp.mean(triplet_loss(a, p, n, cfg.triplet_margin))
    if cfg.loss == "circle":
        return lambda a, p, n: circle_loss(a, p, n, cfg.circle_margin, cfg.circle_scale)
    if cfg.loss == "self_supervised_circle":
        return lambda a, p, n: self_supervised_circle_loss(
            a, p, cfg.circle_margin, cfg.circle_scale
        )
    raise ValueError(f"unknown loss {cfg.loss!r}")


class Trainer:
    def __init__(self, cfg: SiameseConfig, mesh: Optional[Mesh] = None, axis: str = "data"):
        self.cfg = cfg
        self.mesh = mesh
        self.axis = axis
        self.model = EmbeddingNet(
            embedding_dim=cfg.embedding_dim,
            freeze_backbone=cfg.freeze_backbone,
            backbone=cfg.backbone,
            # compute precision only: params/opt-state/loss stay f32
            dtype=jnp.bfloat16 if cfg.compute_dtype == "bf16" else jnp.float32,
        )
        h, w = cfg.image_size
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        variables = self.model.init(
            {"params": jax.random.PRNGKey(cfg.seed), "dropout": jax.random.PRNGKey(1)},
            dummy, train=False,
        )
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        if cfg.torch_weights is not None:
            # graft a pretrained torchvision backbone under the head
            from image_search_engine_tpu.models.torch_import import variables_from_torch

            bb_p, bb_s = variables_from_torch(cfg.torch_weights, cfg.backbone)
            name = next(k for k in self.params if k.startswith("DenseNet"))
            self.params = {**self.params, name: bb_p}
            self.batch_stats = {**self.batch_stats, name: bb_s}
        self.tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=cfg.lr, momentum=cfg.momentum
        )
        self.opt_state = self.tx.init(self.params)
        self.start_epoch = 0
        self.best_val = get_best_val_loss(cfg.ckpt_dir)
        self._loss_fn = make_loss_fn(cfg)
        self._build_steps()
        if mesh is not None:
            rep = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, rep)
            self.batch_stats = jax.device_put(self.batch_stats, rep)
            self.opt_state = jax.device_put(self.opt_state, rep)

    # -- jitted steps ---------------------------------------------------------
    def _build_steps(self):
        model, loss_fn = self.model, self._loss_fn

        def forward(params, batch_stats, key, anchors, negatives, train: bool):
            from image_search_engine_tpu.ops.image_ops import to_unit_f32

            # training batches travel uint8 (4x lighter host->device
            # upload, same convention as the corpus path) and cast to
            # [0,1] f32 on device; f32 input passes through unchanged
            anchors = to_unit_f32(anchors)
            negatives = to_unit_f32(negatives)
            akey, dkey = jax.random.split(key)
            positives = augment_batch(akey, anchors)
            variables = {"params": params, "batch_stats": batch_stats}
            triple = (anchors, positives, negatives)
            if train:
                (a, p, n), updates = apply_siamese(
                    model, variables, triple, train=True,
                    rngs={"dropout": dkey}, mutable=["batch_stats"],
                )
                return loss_fn(a, p, n), updates["batch_stats"]
            a, p, n = apply_siamese(model, variables, triple, train=False)
            return loss_fn(a, p, n), batch_stats

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, batch_stats, opt_state, key, anchors, negatives):
            def lossf(p):
                loss, new_bs = forward(p, batch_stats, key, anchors, negatives, True)
                return loss, new_bs

            (loss, new_bs), grads = jax.value_and_grad(lossf, has_aux=True)(params)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_bs, new_opt, loss

        @jax.jit
        def eval_step(params, batch_stats, key, anchors, negatives):
            loss, _ = forward(params, batch_stats, key, anchors, negatives, False)
            return loss

        @jax.jit
        def embed_fn(params, batch_stats, x):
            from image_search_engine_tpu.ops.image_ops import to_unit_f32

            # corpus batches may arrive uint8 (4x lighter upload); cast on
            # device — f32 [0,1] input passes through unchanged
            return model.apply(
                {"params": params, "batch_stats": batch_stats},
                to_unit_f32(x), train=False
            )

        self._train_step = train_step
        self._eval_step = eval_step
        self._embed_fn = embed_fn

    def _shard_batch(self, *arrays):
        if self.mesh is None:
            return tuple(jnp.asarray(a) for a in arrays)
        sh = NamedSharding(self.mesh, P(self.axis))
        return tuple(jax.device_put(jnp.asarray(a), sh) for a in arrays)

    # -- checkpointing ----------------------------------------------------------
    def save_checkpoint(self, epoch: int, val_loss: float) -> Path:
        self.cfg.ckpt_dir.mkdir(parents=True, exist_ok=True)
        path = self.cfg.ckpt_dir / ckpt_filename(epoch, val_loss)
        blob = flax.serialization.to_bytes(
            {
                "params": self.params,
                "batch_stats": self.batch_stats,
                "opt_state": self.opt_state,
                "epoch": epoch,
                "val_loss": val_loss,
            }
        )
        path.write_bytes(blob)
        return path

    def load_checkpoint(self, path: str | Path) -> int:
        target = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "epoch": 0,
            "val_loss": 0.0,
        }
        state = flax.serialization.from_bytes(target, Path(path).read_bytes())
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        self.opt_state = state["opt_state"]
        self.start_epoch = int(state["epoch"]) + 1
        return self.start_epoch

    def maybe_resume(self) -> None:
        """Resume from the latest epoch checkpoint if one exists (reference
        siamese_tf/train.py:81-101)."""
        latest = get_latest_checkpoint(self.cfg.ckpt_dir)
        if latest is not None:
            epoch = self.load_checkpoint(latest)
            log.info("resumed from %s (next epoch %d, best val %.4f)",
                     latest.name, epoch, self.best_val)

    # -- LR plateau schedule ----------------------------------------------------
    def _set_lr(self, lr: float) -> None:
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)

    def _get_lr(self) -> float:
        return float(self.opt_state.hyperparams["learning_rate"])

    # -- main loop ---------------------------------------------------------------
    def run(
        self,
        train_gen: Optional[PairsGenerator] = None,
        valid_gen: Optional[PairsGenerator] = None,
        epochs: Optional[int] = None,
        steps_per_epoch: Optional[int] = None,
        val_steps: int = 4,
    ) -> Dict[str, Any]:
        cfg = self.cfg
        train_gen = train_gen or PairsGenerator.from_dir(
            cfg.train_dir, cfg.batch_size, cfg.image_size, cfg.seed
        )
        valid_gen = valid_gen or PairsGenerator.from_dir(
            cfg.valid_dir, cfg.batch_size, cfg.image_size, cfg.seed + 1
        )
        epochs = epochs or cfg.epochs
        steps_per_epoch = steps_per_epoch or train_gen.steps_per_epoch()
        self.maybe_resume()

        key = jax.random.PRNGKey(cfg.seed + 17)
        # host decode of batch i+1 overlaps device step i
        train_iter = Prefetcher(iter(train_gen))
        valid_iter = Prefetcher(iter(valid_gen))
        plateau = 0
        history = []
        cfg.log_file.parent.mkdir(parents=True, exist_ok=True)

        try:
            for epoch in range(self.start_epoch, epochs):
                t0 = time.time()
                meter = AverageMeter()
                for _ in range(steps_per_epoch):
                    key, sub = jax.random.split(key)
                    anchors, negatives = next(train_iter)
                    anchors, negatives = self._shard_batch(anchors, negatives)
                    self.params, self.batch_stats, self.opt_state, loss = self._train_step(
                        self.params, self.batch_stats, self.opt_state, sub,
                        anchors, negatives,
                    )
                    # lazy device scalar: no per-step readback barrier
                    meter.update(loss)

                vmeter = AverageMeter()
                for _ in range(val_steps):
                    key, sub = jax.random.split(key)
                    anchors, negatives = next(valid_iter)
                    anchors, negatives = self._shard_batch(anchors, negatives)
                    vmeter.update(self._eval_step(
                        self.params, self.batch_stats, sub, anchors, negatives
                    ))

                rec = {
                    "epoch": epoch, "loss": meter.avg, "val_loss": vmeter.avg,
                    "lr": self._get_lr(), "seconds": round(time.time() - t0, 2),
                }
                history.append(rec)
                with open(cfg.log_file, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                log.info("epoch %d: loss %.4f val %.4f lr %.2e (%.1fs)",
                         epoch, meter.avg, vmeter.avg, rec["lr"], rec["seconds"])

                if vmeter.avg < self.best_val:
                    self.best_val = vmeter.avg
                    path = self.save_checkpoint(epoch, vmeter.avg)
                    log.info("saved best checkpoint %s", path.name)
                    plateau = 0
                else:
                    plateau += 1
                    if plateau >= cfg.lr_reduce_patience:
                        self._set_lr(self._get_lr() * cfg.lr_reduce_factor)
                        log.info("plateau: lr -> %.2e", self._get_lr())
                        plateau = 0
        except KeyboardInterrupt:  # graceful stop (reference train.py:146-147)
            log.info("interrupted at epoch boundary; latest best val %.4f", self.best_val)
        finally:
            train_iter.stop()
            valid_iter.stop()

        return {"best_val": self.best_val, "history": history}

    # -- inference helper (one-head net, siamese_tf/create_index.py:18-31) -----
    def embed(self, images: np.ndarray, batch_size: int = 32) -> np.ndarray:
        fwd = self._embed_fn  # jitted once at construction (no per-call retrace)
        out = []
        n = images.shape[0]
        for s in range(0, n, batch_size):
            chunk = images[s : s + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:
                chunk = np.concatenate([chunk, np.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            emb = fwd(self.params, self.batch_stats, jnp.asarray(chunk))
            out.append(np.asarray(emb)[: batch_size - pad if pad else batch_size])
        return np.concatenate(out)


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--train-dir", type=Path, required=True)
    ap.add_argument("--valid-dir", type=Path, required=True)
    ap.add_argument("--ckpt-dir", type=Path, default=Path("artifacts/siamese_ckpts"))
    ap.add_argument("--loss", default="circle",
                    choices=["triplet", "circle", "self_supervised_circle"])
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=32)
    ap.add_argument("--backbone", default="densenet121")
    ap.add_argument("--image-size", type=int, nargs=2, default=(352, 256),
                    metavar=("H", "W"))
    ap.add_argument("--embedding-dim", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--torch-weights", type=Path, default=None,
                    help="torchvision densenet .pth to import as the "
                         "backbone init (models/torch_import.py)")
    ap.add_argument("--unfreeze-backbone", action="store_true",
                    help="train the backbone too (default: head only, like "
                    "the reference's FREEZE_BACKBONE)")
    ap.add_argument("--compute-dtype", default="bf16", choices=["bf16", "f32"],
                    help="forward/backward compute precision (params, "
                         "optimizer state and loss stay f32 either way)")
    ap.add_argument("--sharded", type=int, nargs="?", const=0, default=None,
                    metavar="N",
                    help="data-parallel over a 1-D mesh of the first N "
                         "local devices (no N = all); batch must divide it")
    a = ap.parse_args(argv)
    cfg = SiameseConfig(
        train_dir=a.train_dir, valid_dir=a.valid_dir, ckpt_dir=a.ckpt_dir,
        loss=a.loss, epochs=a.epochs, batch_size=a.batch_size, backbone=a.backbone,
        image_size=tuple(a.image_size), embedding_dim=a.embedding_dim, lr=a.lr,
        freeze_backbone=not a.unfreeze_backbone, torch_weights=a.torch_weights,
        compute_dtype=a.compute_dtype,
    )
    mesh = None
    if a.sharded is not None:
        from image_search_engine_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(a.sharded or None)
        log.info("data-parallel training over a %d-device mesh",
                 mesh.devices.size)
    Trainer(cfg, mesh=mesh).run()


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    main()
