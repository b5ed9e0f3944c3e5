"""Siamese training configuration + checkpoint-name utilities.

Parity with the reference's ``backend/siamese/config.py``: image size
(357x256 there — default here 352x256, multiple-of-8 for TPU tiling, and
configurable), 128-D embeddings (:95), SGD momentum 0.937 (:89), lr 1e-4
(:111), 100 epochs (:114), N_RESULTS=9 (:98), and the
``epoch_{epoch:02d}-loss_{val_loss:.4f}`` checkpoint naming + latest-epoch
resume scan (:10-38, :75). No import-time filesystem side effects (the
reference scans directories and mkdirs at import)."""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Optional, Tuple

CKPT_RE = re.compile(r"epoch_(\d+)-loss_(\d+\.\d+)\.msgpack$")


def ckpt_filename(epoch: int, val_loss: float) -> str:
    return f"epoch_{epoch:02d}-loss_{val_loss:.4f}.msgpack"


def extract_epoch_and_loss(name: str) -> Optional[Tuple[int, float]]:
    """Parse (epoch, val_loss) out of a checkpoint filename (reference
    extract_epoch_and_loss, siamese/config.py:10-24)."""
    m = CKPT_RE.search(str(name))
    if not m:
        return None
    return int(m.group(1)), float(m.group(2))


def get_latest_checkpoint(ckpt_dir: str | Path) -> Optional[Path]:
    """Highest-epoch checkpoint in a directory (reference
    get_latest_epoch_filename, siamese/config.py:26-38)."""
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.exists():
        return None
    best: Optional[Tuple[int, Path]] = None
    for p in ckpt_dir.iterdir():
        parsed = extract_epoch_and_loss(p.name)
        if parsed and (best is None or parsed[0] > best[0]):
            best = (parsed[0], p)
    return best[1] if best else None


def get_best_val_loss(ckpt_dir: str | Path) -> float:
    """Lowest recorded val loss (the ModelCheckpoint
    ``initial_value_threshold`` resume semantics, siamese_tf/train.py:113-120)."""
    ckpt_dir = Path(ckpt_dir)
    losses = [
        extract_epoch_and_loss(p.name)[1]
        for p in (ckpt_dir.iterdir() if ckpt_dir.exists() else [])
        if extract_epoch_and_loss(p.name)
    ]
    return min(losses) if losses else float("inf")


@dataclasses.dataclass
class SiameseConfig:
    train_dir: Path = Path("data/siamese/train")
    valid_dir: Path = Path("data/siamese/valid")
    ckpt_dir: Path = Path("artifacts/siamese_ckpts")
    log_file: Path = Path("artifacts/siamese_metrics.jsonl")

    backbone: str = "densenet121"
    torch_weights: Optional[Path] = None  # torchvision densenet .pth to
    # import as the backbone init (the reference trains from pretrained
    # torchvision densenet121, siamese_pt/model.py:9-21)
    image_size: Tuple[int, int] = (352, 256)  # reference (357, 256), :92
    embedding_dim: int = 128  # :95
    freeze_backbone: bool = True  # :110
    loss: str = "circle"  # "triplet" | "circle" | "self_supervised_circle"
    triplet_margin: float = 0.5
    circle_margin: float = 0.25
    circle_scale: float = 256.0

    batch_size: int = 32  # reference trains at 4 (:115); TPU wants more
    epochs: int = 100  # :114
    lr: float = 1e-4  # :111
    momentum: float = 0.937  # :89
    # ReduceLROnPlateau equivalents (siamese_tf/train.py:124-130)
    lr_reduce_factor: float = 0.5
    lr_reduce_patience: int = 7

    n_results: int = 9  # :98
    seed: int = 0

    # forward/backward compute precision. Params, optimizer state, batch
    # stats, and the loss stay f32 (the head casts embeddings back to f32,
    # model.py); "bf16" runs the conv stacks on the MXU at its native
    # precision — measured 1.4x faster per step head-only and 1.9x with
    # the backbone unfrozen at reference geometry, with loss parity
    # (BENCH_NOTES "Training-step throughput").
    compute_dtype: str = "bf16"  # "bf16" | "f32"

    def __post_init__(self) -> None:
        self.train_dir = Path(self.train_dir)
        self.valid_dir = Path(self.valid_dir)
        self.ckpt_dir = Path(self.ckpt_dir)
        self.log_file = Path(self.log_file)
        if self.compute_dtype not in ("bf16", "f32"):
            raise ValueError(
                f"compute_dtype must be 'bf16' or 'f32', got {self.compute_dtype!r}"
            )
