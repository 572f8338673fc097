"""cream_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the capabilities
of microsoft/Cream: the model zoo (TinyViT, EfficientViT, AutoFormer/S3, MiniViT,
DeiT+iRPE, Cream MBConv supernet, CDARTS cells, TinyCLIP two-tower), the NAS
machinery (one-shot supernets, evolution search, prioritized paths, differentiable
search), the three distillation styles, weight inheritance / L0 pruning, and the
train/eval/search entry points.

Unlike the reference (nine independent PyTorch codebases), this is ONE framework:
a shared core (mesh/sharding, config, PRNG, checkpointing), a shared ops layer
(Pallas kernels + jnp references), one model zoo, and shared engines.
"""

__version__ = "0.1.0"

from cream_tpu.models import registry as models  # noqa: F401
