from debvader_tpu.models.distributions import (
    MultivariateNormalTriL,
    PixelNormal,
    fill_triangular,
    fill_triangular_inverse,
    kl_mvn_tril_standard_normal,
    mvn_params_size,
    softplus_tril,
    tril_size,
)
from debvader_tpu.models.layers import ConvTranspose2DTF, PReLU
from debvader_tpu.models.vae import (
    DeblenderVAE,
    Decoder,
    Encoder,
    create_model_vae,
    init_vae,
)

__all__ = [
    "MultivariateNormalTriL",
    "PixelNormal",
    "fill_triangular",
    "fill_triangular_inverse",
    "kl_mvn_tril_standard_normal",
    "mvn_params_size",
    "softplus_tril",
    "tril_size",
    "ConvTranspose2DTF",
    "PReLU",
    "DeblenderVAE",
    "Decoder",
    "Encoder",
    "create_model_vae",
    "init_vae",
]
