"""Exact MXU-work accounting for the VAE forward.

The serving rooflines (docs/ROOFLINE.md) hang off two numbers — the
useful MACs per stamp of the 59x59x6 and 45x45x6 architectures — so the
arithmetic lives here as code with pinned tests rather than as constants
in a document.

Counting rules (matching the reference architecture,
/root/reference/src/debvader/model/model.py:61-161):
- encoder stages: 3x3 SAME conv (stride 1) at the stage's input spatial
  size, then 3x3 stride-2 'same' conv at the ceil-halved size;
- the latent Dense pair and the decoder's 4096-wide Dense;
- decoder stages: stride-2 ConvTranspose counted as in_pixels * 9 * cin
  * cout (each input pixel scatters a full 3x3 tap set — what XLA
  executes for 'same' transpose convs), then a stride-1 ConvT at the
  doubled size;
- the final 3x3 band conv on the pre-crop grid (the (2,3) crop to the
  stamp size is free).
"""

from __future__ import annotations

from debvader_tpu.config import ModelConfig

__all__ = ["forward_macs", "per_layer_macs"]


def per_layer_macs(cfg: ModelConfig) -> dict[str, int]:
    """Useful multiply-accumulates per stamp, by MXU layer key (the same
    keys ModelConfig.layer_precision uses)."""
    out: dict[str, int] = {}
    sp = cfg.stamp_size
    cin = cfg.nb_of_bands
    k2 = 9  # 3x3 kernels throughout (reference training/train.py:107)
    for i, f in enumerate(cfg.filters):
        out[f"enc/Conv_{2 * i}"] = sp * sp * k2 * cin * f
        sp = -(-sp // 2)
        out[f"enc/Conv_{2 * i + 1}"] = sp * sp * k2 * f * f
        cin = f
    from debvader_tpu.models.distributions import mvn_params_size

    head = mvn_params_size(cfg.latent_dim)
    out["enc/Dense_0"] = sp * sp * cin * head
    out["dec/Dense_0"] = cfg.latent_dim * head
    out["dec/Dense_1"] = head * sp * sp * cfg.filters[-1]
    spd, cin2 = sp, cfg.filters[-1]
    for i, f in enumerate(reversed(cfg.filters)):
        out[f"dec/ConvT_{2 * i}"] = spd * spd * k2 * cin2 * f
        spd *= 2
        out[f"dec/ConvT_{2 * i + 1}"] = spd * spd * k2 * f * f
        cin2 = f
    out["dec/Conv_0"] = spd * spd * k2 * cin2 * 2 * cfg.nb_of_bands
    return out


def forward_macs(cfg: ModelConfig) -> int:
    """Total useful MACs of one serving forward (per stamp)."""
    return sum(per_layer_macs(cfg).values())
