#!/usr/bin/env python
"""One-time import of the reference's pretrained TF checkpoint.

On a machine where the full astrodeepnet/debvader checkpoint exists (this
repo's snapshot strips the second data shard), this converts the TF
TensorBundle to an Orbax checkpoint loadable by
``debvader_tpu.load_deblender`` and runs a forward-parity smoke check on the
bundled DC2 stamps.

Usage:
    python scripts/import_reference_weights.py \
        --ckpt /path/to/weights_noisy_v4.386--6.61.ckpt \
        --out  debvader_tpu/data/weights/dc2
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True, help="TF checkpoint prefix")
    ap.add_argument("--out", required=True, help="output survey weights dir")
    ap.add_argument(
        "--stamps", default=None, help="optional .npy stamp batch for a parity run"
    )
    ap.add_argument(
        "--assert-parity",
        action="store_true",
        help="after import, run the DC2 fidelity check (<=1e-4 rel. flux vs "
        "the reference Keras outputs; needs tensorflow or "
        "DEBVADER_REFERENCE_OUTPUTS) and fail loudly if it does not hold",
    )
    args = ap.parse_args()

    import jax

    from debvader_tpu.config import ModelConfig
    from debvader_tpu.models.vae import DeblenderVAE
    from debvader_tpu.training.checkpoint import save_weights
    from debvader_tpu.utils.weight_import import import_reference_checkpoint

    variables = import_reference_checkpoint(args.ckpt, strict=True)
    variables = jax.tree_util.tree_map(np.asarray, variables)
    out = Path(args.out) / "imported" / "ckpt"
    save_weights(out, variables)
    print(f"saved {out}")

    if args.stamps:
        stamps = np.load(args.stamps).astype(np.float32)
        # 'highest': true-fp32 MXU products, so the printed fluxes are
        # comparable against a Keras fp32 forward (PARITY.md §7).
        model = DeblenderVAE(
            ModelConfig(nb_of_bands=stamps.shape[-1], matmul_precision="highest")
        )
        dist, _ = model.apply(
            jax.tree_util.tree_map(jax.numpy.asarray, variables),
            stamps,
            z_mode="mean",
        )
        mean = np.asarray(dist.mean())
        print(
            f"forward ok on {stamps.shape}: mean flux "
            f"{mean.sum(axis=(1, 2, 3))[:5]}"
        )

    if args.assert_parity:
        from debvader_tpu.utils.parity import dc2_parity_check

        result = dc2_parity_check(args.ckpt, tol=1e-4)
        print(
            f"DC2 parity OK: max rel flux {result['max_rel_flux']:.3e} "
            f"(<= 1e-4), max abs pixel {result['max_abs_pix']:.3e}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
