"""The deblending convolutional VAE, TPU-first in Flax.

Architecture mirrors the reference Keras graphs exactly (so the DC2
checkpoint imports bit-for-bit) while compiling to a single fused XLA
program:

- Encoder (reference model/model.py:61-100): BatchNorm -> 4x[Conv3x3 same +
  PReLU + Conv3x3 stride-2 same + PReLU] -> Flatten -> PReLU -> Dense(560).
  Spatial path 59 -> 30 -> 15 -> 8 -> 4 (TF 'SAME' ceil semantics — XLA's
  SAME padding is the same rule).
- Latent head (model/model.py:206-214): MultivariateNormalTriL(32) built by
  fill_triangular + softplus(diag)+1e-5.
- Decoder (model/model.py:103-161): PReLU -> Dense(560) -> PReLU ->
  Dense(4*4*256, computed in float32 as the reference casts) -> PReLU ->
  Reshape -> 4x[ConvT stride-2 + PReLU + ConvT stride-1 + PReLU]
  (4 -> 8 -> 16 -> 32 -> 64) -> Conv3x3 relu to 2*bands channels ->
  asymmetric crop 64 -> 59 -> per-pixel Normal(loc, 1e-4 + raw_scale).

Total parameters for the default config: 8,318,452 (3,741,224 encoder /
4,577,228 decoder incl. BatchNorm statistics), matching the bundled DC2
checkpoint index (SURVEY.md §2 row 19).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from debvader_tpu.config import ModelConfig
from debvader_tpu.models.distributions import (
    MultivariateNormalTriL,
    PixelNormal,
    mvn_params_size,
    softplus_tril,
)
from debvader_tpu.models.layers import ConvTranspose2DTF, PReLU, SubpixelConv2D
from debvader_tpu.models.precision import (
    MPConv,
    MPConvTranspose2DTF,
    MPDense,
    resolve,
)

__all__ = [
    "Encoder",
    "Decoder",
    "DeblenderVAE",
    "create_model_vae",
    "create_encoder",
    "create_decoder",
    "init_vae",
]


def _make_conv(cfg, key, name, features, kernel, strides, dtype):
    """nn.Conv or its explicit-limb MPConv twin, per cfg's rung for ``key``.

    Explicit names keep the param tree identical across precision configs
    (checkpoints stay flag-interchangeable)."""
    prec, scheme = resolve(cfg, key)
    if scheme is None:
        return nn.Conv(
            features, kernel, strides=strides, padding="SAME", dtype=dtype,
            param_dtype=jnp.float32, precision=prec, name=name,
        )
    return MPConv(
        features, kernel, strides=strides or (1, 1), scheme=scheme, name=name
    )


def _make_dense(cfg, key, name, features, dtype):
    prec, scheme = resolve(cfg, key)
    if scheme is None:
        return nn.Dense(
            features, dtype=dtype, param_dtype=jnp.float32, precision=prec,
            name=name,
        )
    return MPDense(features, scheme=scheme, name=name)


class Encoder(nn.Module):
    """x (N, S, S, B) -> flat MVN params (N, latent + tril)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        dtype = self.cfg.compute_dtype
        h = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=dtype,
            param_dtype=jnp.float32,
        )(x.astype(dtype))
        ci = 0
        for f, k in zip(self.cfg.filters, self.cfg.kernels):
            for strides in (None, (2, 2)):
                h = _make_conv(
                    self.cfg, f"enc/Conv_{ci}", f"Conv_{ci}", f, (k, k),
                    strides, dtype,
                )(h)
                h = PReLU()(h)
                ci += 1
        # Row-major (H, W, C) flatten == Keras Flatten on channels-last.
        h = h.reshape(h.shape[0], -1)
        h = PReLU()(h)
        h = _make_dense(
            self.cfg, "enc/Dense_0", "Dense_0",
            mvn_params_size(self.cfg.latent_dim), dtype,
        )(h)
        return h.astype(jnp.float32)


class Decoder(nn.Module):
    """z (N, latent) -> PixelNormal over (N, S, S, B)."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, z: jax.Array) -> PixelNormal:
        cfg = self.cfg
        dtype = cfg.compute_dtype
        w = int(math.ceil(cfg.stamp_size / 2 ** len(cfg.filters)))
        prec = cfg.lax_precision
        h = PReLU()(z.astype(dtype))
        h = _make_dense(
            cfg, "dec/Dense_0", "Dense_0", mvn_params_size(cfg.latent_dim),
            dtype,
        )(h)
        h = PReLU()(h)
        # Reference casts to float32 before this Dense (model/model.py:117);
        # strict_cast=False keeps it in the compute dtype instead.
        dense2_dtype = jnp.float32 if cfg.strict_cast else dtype
        h = _make_dense(
            cfg, "dec/Dense_1", "Dense_1", w * w * cfg.filters[-1],
            dense2_dtype,
        )(h.astype(dense2_dtype))
        h = PReLU()(h)
        h = h.reshape(h.shape[0], w, w, cfg.filters[-1]).astype(dtype)
        ti = 0
        for i in range(len(cfg.filters) - 1, -1, -1):
            k = (cfg.kernels[i], cfg.kernels[i])
            # Mixed-precision serving: the last decoder_f32_stages pairs
            # (low filter index = late stage) compute in float32 — the
            # decoder's late stages carry nearly all of the bf16 flux
            # error (config.py ModelConfig.decoder_f32_stages).
            stage_dtype = (
                jnp.float32 if i < cfg.decoder_f32_stages else dtype
            )
            for strides in ((2, 2), (1, 1)):
                convt_prec, convt_scheme = resolve(cfg, f"dec/ConvT_{ti}")
                name = f"ConvTranspose2DTF_{ti}"
                if convt_scheme is None:
                    h = ConvTranspose2DTF(
                        cfg.filters[i], k, strides=strides, dtype=stage_dtype,
                        subpixel=cfg.decoder_subpixel and strides == (2, 2),
                        precision=convt_prec, name=name,
                    )(h)
                else:
                    h = MPConvTranspose2DTF(
                        cfg.filters[i], k, strides=strides,
                        scheme=convt_scheme, name=name,
                    )(h)
                h = PReLU()(h)
                ti += 1
        head_dtype = jnp.float32 if cfg.decoder_f32_stages > 0 else dtype
        head_prec, head_scheme = resolve(cfg, "dec/Conv_0")
        if head_scheme is not None:
            h = MPConv(
                cfg.nb_of_bands * 2, (3, 3), scheme=head_scheme, name="Conv_0"
            )(h)
        elif cfg.decoder_subpixel:
            # Same params at the same tree position ("Conv_0") as the stock
            # conv below — opt-in lane-occupancy recast, ckpt-compatible.
            h = SubpixelConv2D(
                cfg.nb_of_bands * 2, dtype=head_dtype, name="Conv_0",
                precision=head_prec,
            )(h)
        else:
            h = nn.Conv(
                cfg.nb_of_bands * 2, (3, 3), padding="SAME", dtype=head_dtype,
                param_dtype=jnp.float32, precision=head_prec, name="Conv_0",
            )(h)
        h = nn.relu(h)
        # Crop back to the stamp size; odd crops take one extra pixel at the
        # end, matching Keras Cropping2D((c//2, c//2+1)) (model/model.py:141-148).
        crop = h.shape[1] - cfg.stamp_size
        if crop > 0:
            lo = crop // 2
            hi = h.shape[1] - (crop - lo)
            h = h[:, lo:hi, lo:hi, :]
        h = h.astype(jnp.float32)
        loc = h[..., : cfg.nb_of_bands]
        scale = cfg.scale_floor + h[..., cfg.nb_of_bands :]
        return PixelNormal(loc, scale)


class DeblenderVAE(nn.Module):
    """Full VAE: encode to an MVN-TriL posterior, sample, decode.

    ``__call__(x, rng)`` reproduces the reference net(x): a *sampled* latent
    feeds the decoder (tfp's convert_to_tensor_fn=sample, model/model.py:158,
    211-214), which is what makes repeated forward passes stochastic and
    powers the epistemic-uncertainty estimate.  Pass ``z_mode='mean'`` for a
    deterministic forward.
    """

    cfg: ModelConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(self, x: jax.Array, train: bool = False) -> MultivariateNormalTriL:
        params = self.encoder(x, train=train)
        loc, tril = softplus_tril(params, self.cfg.latent_dim, self.cfg.diag_shift)
        return MultivariateNormalTriL(loc, tril)

    def decode(self, z: jax.Array) -> PixelNormal:
        return self.decoder(z)

    def __call__(
        self,
        x: jax.Array,
        rng: jax.Array | None = None,
        train: bool = False,
        z_mode: str = "sample",
    ) -> tuple[PixelNormal, MultivariateNormalTriL]:
        posterior = self.encode(x, train=train)
        if z_mode == "sample":
            if rng is None:
                raise ValueError("z_mode='sample' requires an rng key")
            z = posterior.sample(rng)
        elif z_mode == "mean":
            z = posterior.mean()
        else:
            raise ValueError(f"unknown z_mode {z_mode!r}")
        return self.decode(z), posterior


def create_model_vae(cfg: ModelConfig | None = None) -> DeblenderVAE:
    """Factory mirroring the reference create_model_vae (model/model.py:164).

    Returns the module; encoder/decoder/latent sub-paths are reachable via
    ``apply(..., method=...)`` instead of the reference's four Keras Models.
    """
    return DeblenderVAE(cfg or ModelConfig())


def create_encoder(cfg: ModelConfig | None = None) -> Encoder:
    """Standalone encoder module (reference create_encoder,
    model/model.py:61-100): x -> flat MVN params.  Feed its output through
    ``distributions.softplus_tril`` for the latent posterior."""
    return Encoder(cfg or ModelConfig())


def create_decoder(cfg: ModelConfig | None = None) -> Decoder:
    """Standalone decoder module (reference create_decoder,
    model/model.py:103-161): z -> PixelNormal over stamps."""
    return Decoder(cfg or ModelConfig())


def init_vae(
    model: DeblenderVAE, rng: jax.Array, batch: int = 1
) -> dict[str, Any]:
    """Initialize all variables (params + batch_stats).

    On accelerator backends the init is wrapped in one jitted program:
    flax's eager init dispatches hundreds of tiny ops, which through a
    remote-dispatch link costs minutes (measured 164 s for the default
    model through this environment's tunnel vs ~10 s jitted).  On CPU the
    eager path stays (no compile cost for the many tiny test models).
    Values are identical either way — threefry derivations and the
    initializers are deterministic under jit."""
    cfg = model.cfg
    x = jnp.zeros((batch, cfg.stamp_size, cfg.stamp_size, cfg.nb_of_bands), jnp.float32)
    init_rng, sample_rng = jax.random.split(rng)
    if jax.default_backend() != "cpu":
        return jax.jit(
            lambda r, s, x: model.init({"params": r}, x, rng=s)
        )(init_rng, sample_rng, x)
    return model.init({"params": init_rng}, x, rng=sample_rng)
