"""debvader_tpu — a TPU-native galaxy-deblending framework.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of
astrodeepnet/debvader (see SURVEY.md): probabilistic conv-VAE stamp
deblending, scene-level detect -> extract -> deblend -> subtract pipelines,
two-stage transfer training, and mesh-parallel scaling.
"""

__version__ = "0.1.0"

from debvader_tpu.api import deblend, deblend_samples
from debvader_tpu.config import (
    DetectionConfig,
    ModelConfig,
    PipelineConfig,
    TrainConfig,
)
from debvader_tpu.models.vae import DeblenderVAE, create_model_vae, init_vae
from debvader_tpu.training.checkpoint import load_deblender
from debvader_tpu.training.train import train_deblender, train_network

__all__ = [
    "deblend",
    "deblend_samples",
    "DeblenderVAE",
    "create_model_vae",
    "init_vae",
    "load_deblender",
    "train_deblender",
    "train_network",
    "ModelConfig",
    "TrainConfig",
    "DetectionConfig",
    "PipelineConfig",
    "__version__",
]


def __getattr__(name):
    # Scene pipeline classes and ops import lazily to keep bare model use
    # light.
    if name in ("DeblendField", "IterativeDeblendField", "TiledDeblendField"):
        from debvader_tpu.pipeline import field, iterative, tiles

        return {
            "DeblendField": field.DeblendField,
            "IterativeDeblendField": iterative.IterativeDeblendField,
            "TiledDeblendField": tiles.TiledDeblendField,
        }[name]
    if name == "ShardedFieldDeblender":
        from debvader_tpu.pipeline.sharded_field import ShardedFieldDeblender

        return ShardedFieldDeblender
    if name == "detect_objects":
        from debvader_tpu.ops.detection import detect_objects

        return detect_objects
    if name == "detect_objects_tiled":
        from debvader_tpu.pipeline.tiles import detect_objects_tiled

        return detect_objects_tiled
    if name == "extract_cutouts":
        from debvader_tpu.ops.extraction import extract_cutouts

        return extract_cutouts
    raise AttributeError(name)
