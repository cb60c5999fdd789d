"""End-to-end science validation: flux / centroid / ellipticity recovery.

The deblending paper behind the reference (Arcelin et al. 2020,
arXiv:2005.12039, linked from /root/reference/README.md:13) evaluates the
VAE deblender *scientifically* — flux and ellipticity recovery of the
deblended galaxies against truth — but the reference repo ships no such
harness (its measure/ package is an empty stub,
/root/reference/src/debvader/measure/__init__.py).  This script is that
harness for the TPU framework:

1. simulate a held-out batch of blends (seed disjoint from the sim_demo
   training seeds),
2. deblend with the shipped ``sim_demo`` weights (deterministic latent,
   ``z_mode='mean'``),
3. measure flux / centroid / ellipticity on (a) the raw blend and (b) the
   deblended mean stamp, each against the noiseless isolated truth,
4. report the recovery improvement.

The blend measurements are the "do nothing" floor: neighbor flux
contaminates every moment measured on the blend, so a working deblender
must beat them across the board.

Usage: python scripts/science_validation.py [n_stamps] [seed]
Prints a human table to stderr and ONE machine-readable JSON line to
stdout.
"""

import json
import sys

import jax
import numpy as np

import debvader_tpu as dt
from debvader_tpu.data.simulate import simulate_batch
from debvader_tpu.ops.measure import centroid, ellipticity, flux


def recovery_metrics(n: int = 256, seed: int = 777, net=None) -> dict:
    """Flux/centroid/ellipticity recovery of the sim_demo deblender on a
    held-out simulated batch, vs measuring the raw blend.  Returns a flat
    dict of medians/percentiles (all float) — the contract the science
    test (tests/test_science.py) asserts against."""
    if net is None:
        net = dt.load_deblender("sim_demo")
    blend, _, iso_clean = simulate_batch(jax.random.PRNGKey(seed), n)
    blend = np.asarray(blend)
    truth = np.asarray(iso_clean)
    means, _ = dt.deblend(net, blend, z_mode="mean")

    out: dict[str, float] = {"n": float(n), "seed": float(seed)}

    f_true = np.asarray(flux(truth))
    rel = lambda f: np.abs(np.asarray(flux(f)) - f_true) / np.maximum(
        np.abs(f_true), 1e-9
    )
    for name, stamps in (("blend", blend), ("deblended", means)):
        r = rel(stamps)
        out[f"flux_relerr_med_{name}"] = float(np.median(r))
        out[f"flux_relerr_p90_{name}"] = float(np.percentile(r, 90))

    c_true = np.asarray(centroid(truth))
    cerr = lambda s: np.linalg.norm(np.asarray(centroid(s)) - c_true, axis=-1)
    for name, stamps in (("blend", blend), ("deblended", means)):
        out[f"centroid_err_med_{name}"] = float(np.median(cerr(stamps)))

    e_true = np.asarray(ellipticity(truth))
    eerr = lambda s: np.linalg.norm(
        np.asarray(ellipticity(s)) - e_true, axis=-1
    )
    for name, stamps in (("blend", blend), ("deblended", means)):
        out[f"ellip_err_med_{name}"] = float(np.median(eerr(stamps)))
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 777
    m = recovery_metrics(n=n, seed=seed)
    print(
        f"science validation — {n} held-out simulated blends (seed {seed})\n"
        f"  flux rel err   median: blend {m['flux_relerr_med_blend']:.4f}"
        f" -> deblended {m['flux_relerr_med_deblended']:.4f}"
        f"   (p90 {m['flux_relerr_p90_blend']:.4f}"
        f" -> {m['flux_relerr_p90_deblended']:.4f})\n"
        f"  centroid err   median: blend {m['centroid_err_med_blend']:.3f} px"
        f" -> deblended {m['centroid_err_med_deblended']:.3f} px\n"
        f"  ellipticity err median: blend {m['ellip_err_med_blend']:.4f}"
        f" -> deblended {m['ellip_err_med_deblended']:.4f}",
        file=sys.stderr,
    )
    print(json.dumps(m))


if __name__ == "__main__":
    main()
