"""Per-layer MXU precision schemes (models/precision.py) and the
flux-calibrated fidelity serving mode (utils/flux_cal.py).

The explicit bf16-limb schemes execute identically on CPU and TPU (bf16
products are exact in fp32 accumulation on both; only summation order
differs), so these CPU tests pin the arithmetic the serving modes rely on.
Hardware numbers live in BASELINE.md (scripts/bench_precision.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.config import ModelConfig, fidelity_serving_config
from debvader_tpu.models import precision as mp
from debvader_tpu.models.vae import DeblenderVAE, init_vae

TINY = ModelConfig(
    stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3)
)
TINY_KEYS = (
    [f"enc/Conv_{i}" for i in range(4)]
    + ["enc/Dense_0", "dec/Dense_0", "dec/Dense_1"]
    + [f"dec/ConvT_{i}" for i in range(4)]
    + ["dec/Conv_0"]
)


@pytest.fixture(scope="module")
def tiny():
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 23, 23, 3)), jnp.float32
    )
    ref = model.apply(variables, x, z_mode="mean")[0].loc
    return model, variables, x, ref


def _uniform(rung):
    return ModelConfig(
        **{**dataclasses.asdict(TINY), "layer_precision": {k: rung for k in TINY_KEYS}}
    )


def _loc(cfg, variables, x):
    return DeblenderVAE(cfg).apply(variables, x, z_mode="mean")[0].loc


def test_param_tree_unchanged_across_precision_configs(tiny):
    """MP* modules sit at the same tree positions with the same param names
    as the stock modules — checkpoints are flag-interchangeable."""
    _, variables, _, _ = tiny
    v9 = init_vae(DeblenderVAE(_uniform("bf16x9")), jax.random.PRNGKey(0))
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v9)


def test_bf16x9_matches_fp32(tiny):
    """The 9-term scheme multiplies the exact 3-limb (= full fp32)
    representation: agreement with the native fp32 forward up to
    accumulation order."""
    _, variables, x, ref = tiny
    out = _loc(_uniform("bf16x9"), variables, x)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(out - ref).max()) < 1e-5 * scale


def test_scheme_ladder_orders(tiny):
    """More terms -> monotonically closer to fp32; the RTZ native-HIGH
    emulation is measurably worse than the RNE split at equal pass count
    (the hardware-validated property the calibration mode exploits)."""
    _, variables, x, ref = tiny
    err = {
        rung: float(jnp.abs(_loc(_uniform(rung), variables, x) - ref).max())
        for rung in ("bf16x1", "bf16x3t", "bf16x3", "bf16x6")
    }
    assert err["bf16x1"] > err["bf16x3t"] > err["bf16x3"] > err["bf16x6"]


def test_resolve_mapping():
    cfg = ModelConfig(matmul_precision="high")
    prec, scheme = mp.resolve(cfg, "enc/Conv_0")
    assert prec == jax.lax.Precision.HIGH and scheme is None
    cfg_emul = ModelConfig(matmul_precision="high", limb_emulation=True)
    assert mp.resolve(cfg_emul, "enc/Conv_0") == (None, "bf16x3t")
    cfg_mix = ModelConfig(
        matmul_precision="high", layer_precision={"enc/Conv_0": "bf16x4"}
    )
    assert mp.resolve(cfg_mix, "enc/Conv_0") == (None, "bf16x4")
    assert mp.resolve(cfg_mix, "enc/Conv_1") == (jax.lax.Precision.HIGH, None)


def test_split_limbs_reconstructs_exactly():
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(256,)) * 100, jnp.float32
    )
    for mode in ("rne", "rtz"):
        limbs = mp.split_limbs(x, 3, mode)
        total = sum(np.asarray(l, np.float64) for l in limbs)
        np.testing.assert_array_equal(
            total.astype(np.float32), np.asarray(x)
        )


def test_layer_precision_validation():
    with pytest.raises(ValueError, match="layer_precision"):
        ModelConfig(layer_precision={"enc/Conv_0": "bf16x7"})


def test_layer_precision_rejects_unknown_keys():
    """A typo'd layer key would silently fall back to matmul_precision — in
    a precision-placement workflow that is a silently non-compliant serving
    mode (ADVICE r4).  Keys validate against the enumerable MXU-layer set."""
    with pytest.raises(ValueError, match="names no MXU layer"):
        ModelConfig(layer_precision={"dec/Convt_0": "highest"})  # bad case
    with pytest.raises(ValueError, match="names no MXU layer"):
        # ConvT_8 exceeds the 2*len(filters)=8 range of the default arch
        ModelConfig(layer_precision={"dec/ConvT_8": "high"})
    # every advertised key of the default architecture is accepted
    cfg = ModelConfig()
    ModelConfig(
        layer_precision={k: "high" for k in cfg.precision_layer_keys()}
    )


def test_flux_calibration_attach_and_apply(tiny):
    """deblend() honors an attached flux_cal collection: outputs divide by
    the per-band gain; absent -> identical to the uncalibrated forward."""
    from debvader_tpu.api import deblend
    from debvader_tpu.utils.flux_cal import attach_flux_calibration

    model, variables, x, _ = tiny
    base, _ = deblend((model, variables), x, z_mode="mean")
    cal_vars = attach_flux_calibration(model, variables, n=8)
    scale = np.asarray(cal_vars["flux_cal"]["scale"])
    assert scale.shape == (3,)
    # native fp32 vs HIGHEST on CPU: identical arithmetic -> gain == 1
    np.testing.assert_allclose(scale, 1.0, atol=1e-6)
    out, _ = deblend((model, cal_vars), x, z_mode="mean")
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(base) / scale, rtol=1e-6
    )
    # a non-unit gain must divide out of loc per band
    fake = dict(
        variables, flux_cal={"scale": jnp.asarray([0.5, 1.0, 2.0], jnp.float32)}
    )
    out2, dist2 = deblend((model, fake), x, z_mode="mean")
    np.testing.assert_allclose(
        np.asarray(out2),
        np.asarray(base) / np.asarray([0.5, 1.0, 2.0]),
        rtol=1e-6,
    )


def test_fidelity_mode_compliant_emulated():
    """The adopted fidelity serving mode (fidelity_serving_config +
    flux_cal), executed with CPU emulation of the TPU's HIGH arithmetic,
    meets the <=1e-4 max-flux-error clause on held-out stamps with margin
    (hardware measurement in BASELINE.md r4: raw 1.9e-4 -> 6e-5)."""
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.checkpoint import load_deblender
    from debvader_tpu.utils.flux_cal import (
        apply_flux_calibration,
        attach_flux_calibration,
    )

    _, variables = load_deblender("sim_demo")
    ref_model = DeblenderVAE(ModelConfig())  # true fp32 on CPU
    cfg = fidelity_serving_config(limb_emulation=True)
    model = DeblenderVAE(cfg)
    cal_vars = attach_flux_calibration(model, variables, n=64)
    test = jnp.asarray(
        np.asarray(simulate_batch(jax.random.PRNGKey(7), 64)[0], np.float32)
    )

    @jax.jit
    def both(variables, test):
        core = {k: variables[k] for k in ("params", "batch_stats")}
        ref = ref_model.apply(core, test, z_mode="mean")[0].loc
        dist, _ = model.apply(core, test, z_mode="mean")
        cal = apply_flux_calibration(dist, variables).loc
        raw = dist.loc
        return ref, raw, cal

    ref, raw, cal = jax.device_get(both(cal_vars, test))
    tr = ref.astype(np.float64).sum(axis=(1, 2, 3))

    def max_rel(a):
        return float(
            np.max(
                np.abs(a.astype(np.float64).sum(axis=(1, 2, 3)) - tr)
                / np.abs(tr)
            )
        )

    raw_err, cal_err = max_rel(raw), max_rel(cal)
    assert raw_err > 1e-4  # HIGH alone genuinely fails the clause
    assert cal_err < 1e-4  # calibration brings it into compliance
    assert cal_err < raw_err / 2


def test_fidelity_mode_compliant_45x45_emulated():
    """The literal BASELINE.json north-star workload is 45x45x6; the r5
    bench line serves it in the same calibrated-HIGH mode and crosses the
    1e5 stamps/s target (BASELINE.md r5).  Pin the <=1e-4 clause side for
    the 45 architecture: the RTZ truncation bias is an arithmetic property
    of the layer stack, so the calibration works on this arch too
    (measured here under CPU emulation: raw ~1.9e-4 -> ~3.4e-5)."""
    import dataclasses

    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.vae import init_vae
    from debvader_tpu.utils.flux_cal import (
        apply_flux_calibration,
        attach_flux_calibration,
    )

    ref_model = DeblenderVAE(ModelConfig(stamp_size=45))  # true fp32 on CPU
    variables = init_vae(ref_model, jax.random.PRNGKey(3))
    cfg = dataclasses.replace(
        fidelity_serving_config(limb_emulation=True), stamp_size=45
    )
    model = DeblenderVAE(cfg)
    cal_vars = attach_flux_calibration(model, variables, n=64)
    test = jnp.asarray(
        np.asarray(
            simulate_batch(jax.random.PRNGKey(7), 64, stamp=45)[0], np.float32
        )
    )

    @jax.jit
    def both(variables, test):
        core = {k: variables[k] for k in ("params", "batch_stats")}
        ref = ref_model.apply(core, test, z_mode="mean")[0].loc
        dist, _ = model.apply(core, test, z_mode="mean")
        return ref, dist.loc, apply_flux_calibration(dist, variables).loc

    ref, raw, cal = jax.device_get(both(cal_vars, test))
    tr = ref.astype(np.float64).sum(axis=(1, 2, 3))

    def max_rel(a):
        return float(
            np.max(
                np.abs(a.astype(np.float64).sum(axis=(1, 2, 3)) - tr)
                / np.abs(tr)
            )
        )

    assert max_rel(raw) > 1e-4
    assert max_rel(cal) < 1e-4


def test_fidelity_calibration_transfers_to_real_stamps():
    """The gain is an arithmetic property, not a data fit: the correction
    measured on SIMULATED stamps must bring REAL DC2 cutouts into the
    clause too (measured: raw emulated-HIGH 2.2e-4 -> 7.1e-5)."""
    from pathlib import Path

    real_path = Path(
        "/root/reference/src/debvader/data/dc2_imgs/imgs_dc2.npy"
    )
    if not real_path.exists():
        pytest.skip("bundled DC2 stamps not present")
    from debvader_tpu.training.checkpoint import load_deblender
    from debvader_tpu.utils.flux_cal import (
        apply_flux_calibration,
        attach_flux_calibration,
    )

    _, variables = load_deblender("sim_demo")
    ref_model = DeblenderVAE(ModelConfig())
    model = DeblenderVAE(fidelity_serving_config(limb_emulation=True))
    cal_vars = attach_flux_calibration(model, variables, n=64)
    real = jnp.asarray(np.load(real_path).astype(np.float32))
    core = {k: cal_vars[k] for k in ("params", "batch_stats")}
    ref = np.asarray(
        jax.jit(lambda v, im: ref_model.apply(v, im, z_mode="mean")[0].loc)(
            core, real
        ),
        np.float64,
    )
    dist, _ = jax.jit(lambda v, im: model.apply(v, im, z_mode="mean"))(core, real)
    cal = np.asarray(apply_flux_calibration(dist, cal_vars).loc, np.float64)
    tr = ref.sum(axis=(1, 2, 3))
    rel = np.abs(cal.sum(axis=(1, 2, 3)) - tr) / np.abs(tr)
    assert rel.max() < 1e-4
