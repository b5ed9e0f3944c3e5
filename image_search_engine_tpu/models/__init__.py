"""CNN backbones in Flax: ResNet-50 (reference's torchvision embedder),
BiT/ResNet-v2 (reference's HuggingFace google/bit-50), DenseNet-121 (the
siamese backbone) — all batched, jittable, bfloat16-friendly."""

from image_search_engine_tpu.models.resnet import ResNet50  # noqa: F401
from image_search_engine_tpu.models.densenet import DenseNet121  # noqa: F401
from image_search_engine_tpu.models.bit import BiT50  # noqa: F401
