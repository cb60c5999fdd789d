"""Reference-shaped namespace for drop-in migration.

Users of astrodeepnet/debvader import from module paths like
``debvader.detect.detection`` and ``debvader.deblend_cutout.deblender``
(reference src/debvader/__init__.py and submodules).  This module mirrors
that surface over the TPU-native implementations so a port is a one-line
import change:

    from debvader_tpu.compat import (
        DeblendField, IterativeDeblendField,       # debvader/__init__.py:1-2
        detect_objects,                            # detect/detection.py:5
        extract_cutouts,                           # extract/extraction.py:4
        deblend,                                   # deblend_cutout/deblender.py:6
        position_optimization,                     # deblend_cutout/optimization.py:6
        normalize_non_linear, denormalize_non_linear,  # normalize/normalize.py:3-7
        mse, vae_loss,                             # training/metrics.py:4,16
        create_model_vae, load_deblender,          # model/model.py:164,221
        train_network, train_deblender, define_callbacks,  # training/train.py
    )

Signature differences from the reference are documented on each function
(e.g. ``net`` is a (model, variables) pair instead of a Keras Model;
``vae_loss`` takes our PixelNormal instead of a TFP distribution).
"""

from debvader_tpu.api import deblend
from debvader_tpu.models.vae import create_decoder, create_encoder, create_model_vae
from debvader_tpu.ops.detection import detect_objects
from debvader_tpu.ops.extraction import extract_cutouts_host as extract_cutouts
from debvader_tpu.ops.normalize import denormalize_non_linear, normalize_non_linear
from debvader_tpu.ops.registration import position_optimization
from debvader_tpu.pipeline.field import DeblendField
from debvader_tpu.pipeline.iterative import IterativeDeblendField
from debvader_tpu.training.checkpoint import define_callbacks, load_deblender
from debvader_tpu.training.losses import mse
from debvader_tpu.training.train import train_deblender, train_network

__all__ = [
    "DeblendField",
    "IterativeDeblendField",
    "detect_objects",
    "extract_cutouts",
    "deblend",
    "position_optimization",
    "normalize_non_linear",
    "denormalize_non_linear",
    "mse",
    "vae_loss",
    "create_model_vae",
    "create_encoder",
    "create_decoder",
    "load_deblender",
    "train_network",
    "train_deblender",
    "define_callbacks",
]


def vae_loss(ground_truth, predicted_distribution):
    """Reconstruction NLL like the reference vae_loss
    (training/metrics.py:16-26): -log_prob of the truth under the predicted
    per-pixel Normal.  Returns the per-pixel array (Keras reduced it to a
    mean; our training loop does the same)."""
    return -predicted_distribution.log_prob(ground_truth)
