"""int8 post-training quantization (models/quantized.py).

The float path of the re-expressed forward must be BIT-IDENTICAL to the
Flax modules — that pin is what makes the int8 path's divergence
attributable to quantization alone.  Accuracy with CONVERGED weights is
NOT photometry-grade (~0.22 mean total-flux rel err measured on XLA CPU
fp32 with the round-3 retrained sim_demo checkpoint — see
models/quantized.py's accuracy note); the trained-weights test below pins
that measured envelope so silent further regressions are caught, it does
not claim fidelity.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.config import ModelConfig
from debvader_tpu.models import quantized as q
from debvader_tpu.models.vae import DeblenderVAE, init_vae

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=8, filters=(8, 16), kernels=(3, 3))


@pytest.fixture(scope="module")
def tiny():
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 23, 23, 3)), jnp.float32
    )
    return model, variables, x


def test_float_path_bit_identical(tiny):
    model, variables, x = tiny
    rng = jax.random.PRNGKey(1)
    dist_ref, post_ref = model.apply(variables, x, rng=rng)
    qv = q.quantize_vae(model, variables, x, rng=rng)
    dist_f, post_f = q.quantized_forward(qv, x, rng=rng, quant=False)
    assert np.array_equal(np.asarray(dist_f.loc), np.asarray(dist_ref.loc))
    assert np.array_equal(np.asarray(dist_f.scale), np.asarray(dist_ref.scale))
    assert np.array_equal(np.asarray(post_f.loc), np.asarray(post_ref.loc))
    assert np.array_equal(
        np.asarray(post_f.scale_tril), np.asarray(post_ref.scale_tril)
    )


def test_float_path_bit_identical_bf16(tiny):
    _, variables, x = tiny
    model16 = DeblenderVAE(
        ModelConfig(
            stamp_size=23, nb_of_bands=3, latent_dim=8, filters=(8, 16),
            kernels=(3, 3), dtype="bfloat16", strict_cast=False,
        )
    )
    rng = jax.random.PRNGKey(1)
    dist_ref, _ = model16.apply(variables, x, rng=rng)
    qv = q.quantize_vae(model16, variables, x, rng=rng)
    dist_f, _ = q.quantized_forward(qv, x, rng=rng, quant=False)
    assert np.array_equal(np.asarray(dist_f.loc), np.asarray(dist_ref.loc))


def test_weight_quantization_roundtrip(tiny):
    model, variables, x = tiny
    qv = q.quantize_vae(model, variables, x, rng=jax.random.PRNGKey(1))
    # every quantized kernel reconstructs within half a quantization step
    for name, (qk, scale) in qv.qweights.items():
        scope, layer = name.split("/")
        p = variables["params"]["encoder" if scope == "enc" else "decoder"][layer]
        k = np.asarray(p["kernel"], np.float64)
        if layer.startswith("ConvTranspose"):
            out_axis = 2
        elif layer.startswith("Conv"):
            out_axis = 3
        else:
            out_axis = 1
        shape = [1] * k.ndim
        shape[out_axis] = -1
        s = np.asarray(scale, np.float64).reshape(shape)
        recon = np.asarray(qk, np.float64) * s
        assert np.max(np.abs(recon - k) / s) <= 0.5 + 1e-6, name
        assert qk.dtype == jnp.int8
    # coverage: all convs + convTs + the two big Denses
    nf = len(TINY.filters)
    assert len(qv.qweights) == 4 * nf + 2


def test_quantized_outputs_close(tiny):
    model, variables, x = tiny
    rng = jax.random.PRNGKey(1)
    qv = q.quantize_vae(model, variables, x, rng=rng)
    dist_ref, _ = model.apply(variables, x, rng=rng)
    dist_q, _ = q.quantized_forward(qv, x, rng=rng)
    lr, lq = np.asarray(dist_ref.loc), np.asarray(dist_q.loc)
    assert np.all(np.isfinite(lq))
    # random-init outputs are near zero; bound absolute error vs output span
    span = max(lr.max() - lr.min(), 1e-6)
    assert np.max(np.abs(lq - lr)) < 0.1 * span


def test_jitted_closure_matches_unjitted(tiny):
    model, variables, x = tiny
    rng = jax.random.PRNGKey(2)
    qv = q.quantize_vae(model, variables, x, rng=rng)
    fwd = q.make_quantized_forward(qv, z_mode="mean")
    loc, scale = fwd(x, rng)
    dist_q, _ = q.quantized_forward(qv, x, rng=rng, z_mode="mean")
    np.testing.assert_allclose(np.asarray(loc), np.asarray(dist_q.loc), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(scale), np.asarray(dist_q.scale), rtol=1e-6, atol=1e-8)


def test_trained_weights_flux_fidelity():
    """End-to-end accuracy ENVELOPE with the shipped trained weights:
    calibrate on one simulated batch, evaluate on a disjoint one.
    Measured on CPU fp32 (round-3 retrained sim_demo): flux rel err mean
    0.219 / max 0.375, pixel RMSE ratio 0.166 — int8 PTQ is not
    photometry-grade on converged weights (models/quantized.py accuracy
    note); these bounds pin the measured envelope (~1.5x margin) so a
    change that silently worsens the quantized path still fails."""
    import debvader_tpu as dt
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.training.checkpoint import default_weights_dir

    if not (default_weights_dir() / "sim_demo").exists():
        pytest.skip("sim_demo weights not present")
    model, variables = dt.load_deblender("sim_demo")
    calib, _, _ = simulate_batch(jax.random.PRNGKey(5), 48)
    test, _, _ = simulate_batch(jax.random.PRNGKey(9), 24)
    qv = q.quantize_vae(model, variables, calib)
    dist_ref, _ = model.apply(variables, test, z_mode="mean")
    dist_q, _ = q.quantized_forward(qv, test, z_mode="mean")
    lr, lq = np.asarray(dist_ref.loc), np.asarray(dist_q.loc)
    tot_r, tot_q = lr.sum(axis=(1, 2, 3)), lq.sum(axis=(1, 2, 3))
    rel = np.abs(tot_q - tot_r) / tot_r
    assert rel.mean() < 0.35, f"total-stamp flux rel err mean {rel.mean():.4f}"
    assert rel.max() < 0.6, f"total-stamp flux rel err max {rel.max():.4f}"
    rmse_ratio = np.sqrt(((lq - lr) ** 2).mean()) / np.sqrt((lr**2).mean())
    assert rmse_ratio < 0.3, f"pixel RMSE ratio {rmse_ratio:.4f}"
    sr, sq = np.asarray(dist_ref.scale), np.asarray(dist_q.scale)
    srel = abs(sq.sum() - sr.sum()) / sr.sum()
    assert srel < 0.5, f"scale flux rel err {srel:.4f}"


def test_sampled_mode_statistics(tiny):
    """Sampled forwards through the int8 path stay statistically aligned
    with the float path (same rng -> same latent draw; the decoder is the
    only divergence)."""
    model, variables, x = tiny
    rng = jax.random.PRNGKey(3)
    qv = q.quantize_vae(model, variables, x, rng=rng)
    dist_ref, post_ref = model.apply(variables, x, rng=rng)
    dist_q, post_q = q.quantized_forward(qv, x, rng=rng)
    # encoder quantization perturbs the posterior slightly but finitely
    assert np.all(np.isfinite(np.asarray(post_q.loc)))
    assert np.all(np.isfinite(np.asarray(dist_q.loc)))
    # posterior locs must be close (encoder-only error)
    dl = np.max(np.abs(np.asarray(post_q.loc) - np.asarray(post_ref.loc)))
    spread = np.asarray(post_ref.loc).std() + 1e-9
    assert dl < 1.0 * spread + 0.1


def test_normalise_mismatch_rejected_and_matched_works(tiny):
    """A quantized bundle calibrated on raw fluxes must not silently serve
    a normalise=True pipeline (scales are orders of magnitude too wide for
    (-1,1)-normalized inputs, quantizing everything to ~0) — DeblendField
    rejects the mismatch; the matched combination serves sanely."""
    from debvader_tpu.pipeline.field import DeblendField

    model, variables, x = tiny
    field = np.zeros((1, 64, 64, 3), np.float32)
    field[0, 28:35, 28:35, :] = 100.0

    qv_raw = q.quantize_vae(model, variables, x, rng=jax.random.PRNGKey(1))
    with pytest.raises(ValueError, match="normalise"):
        DeblendField(
            (model, variables), field, cutout_size=23, nb_of_bands=3,
            normalise=True, quantized=qv_raw,
        )

    qv_norm = q.quantize_vae(
        model, variables, x, rng=jax.random.PRNGKey(1), normalise=True
    )
    assert qv_norm.normalise
    with pytest.raises(ValueError, match="normalise"):
        DeblendField(
            (model, variables), field, cutout_size=23, nb_of_bands=3,
            normalise=False, quantized=qv_norm,
        )

    df = DeblendField(
        (model, variables), field, cutout_size=23, nb_of_bands=3,
        normalise=True, quantized=qv_norm,
    )
    res = df.deblend_field(np.asarray([[0, 0]]))
    means = np.stack(list(res["output_images_mean"]))
    assert means.shape == (1, 23, 23, 3)
    assert np.isfinite(means).all()


def test_layers_override_selective_quantization(tiny):
    """quantize_vae(layers=...) quantizes exactly the named layers; unknown
    names are rejected; a quantized-subset forward differs from float only
    through those layers (here: quantizing nothing == float path)."""
    model, variables, x = tiny
    rng = jax.random.PRNGKey(1)

    qv_none = q.quantize_vae(model, variables, x, rng=rng, layers=[])
    assert qv_none.qweights == {}
    df, _ = q.quantized_forward(qv_none, x, z_mode="mean", quant=False)
    dq, _ = q.quantized_forward(qv_none, x, z_mode="mean", quant=True)
    np.testing.assert_array_equal(np.asarray(df.loc), np.asarray(dq.loc))

    sub = ["enc/Conv_0", "dec/ConvTranspose2DTF_1"]
    qv = q.quantize_vae(model, variables, x, rng=rng, layers=sub)
    assert sorted(qv.qweights) == sorted(sub)
    dqs, _ = q.quantized_forward(qv, x, z_mode="mean", quant=True)
    assert not np.array_equal(np.asarray(df.loc), np.asarray(dqs.loc))

    with pytest.raises(ValueError, match="unknown quantization layers"):
        q.quantize_vae(model, variables, x, rng=rng, layers=["enc/Conv_99"])


def test_f32_stages_rejected():
    """The quantized forward has no per-stage dtype split — mixing the two
    opt-in modes must fail loudly, not silently diverge from the float
    reference path."""
    from debvader_tpu.models.vae import init_vae as _init

    cfg = ModelConfig(
        stamp_size=23, nb_of_bands=3, latent_dim=8, filters=(8, 16),
        kernels=(3, 3), decoder_f32_stages=1,
    )
    model = DeblenderVAE(cfg)
    variables = _init(model, jax.random.PRNGKey(0))
    x = jnp.zeros((2, 23, 23, 3), jnp.float32)
    with pytest.raises(ValueError, match="decoder_f32_stages"):
        q.quantize_vae(model, variables, x)


def test_qat_finetune_mechanism(tiny):
    """QAT fine-tuning (qat_finetune): the STE fake-quant forward is
    differentiable and a few steps reduce the QUANTIZED (int8) forward's
    reconstruction loss on the training distribution; float parts of the
    bundle (BN, PReLU, unquantized layers) and the activation scales are
    preserved; the re-quantized weights match the fine-tuned floats."""
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.quantized import (
        qat_finetune,
        quantize_vae,
        quantized_forward,
    )

    model, variables, _ = tiny
    calib, _, _ = simulate_batch(jax.random.PRNGKey(3), 16, stamp=23, bands=3)
    qv = quantize_vae(model, variables, calib)
    # fixed teacher: the ORIGINAL float forward (what distillation targets)
    x_test, _, _ = simulate_batch(jax.random.PRNGKey(11), 16, stamp=23, bands=3)
    teacher, _ = quantized_forward(
        qv, x_test, jax.random.PRNGKey(0), z_mode="mean", quant=False
    )

    def divergence(qv_k):
        dist, _ = quantized_forward(
            qv_k, x_test, jax.random.PRNGKey(0), z_mode="mean"
        )
        return float(jnp.mean(jnp.square(dist.loc - teacher.loc)))

    before = divergence(qv)
    qv2 = qat_finetune(
        qv, steps=30, batch=16, learning_rate=1e-3, steps_per_dispatch=10
    )
    after = divergence(qv2)
    # the int8 forward moved toward the original float teacher
    assert after < before
    # activation scales fixed; weights re-quantized from the new floats
    for k in qv.act_scales:
        np.testing.assert_array_equal(
            np.asarray(qv.act_scales[k]), np.asarray(qv2.act_scales[k])
        )
    assert not np.array_equal(
        np.asarray(qv.qweights["enc/Conv_0"][0]),
        np.asarray(qv2.qweights["enc/Conv_0"][0]),
    ) or not np.array_equal(
        np.asarray(qv.variables["params"]["encoder"]["Conv_0"]["kernel"]),
        np.asarray(qv2.variables["params"]["encoder"]["Conv_0"]["kernel"]),
    )
    # batch_stats untouched (frozen BN)
    np.testing.assert_array_equal(
        np.asarray(qv.variables["batch_stats"]["encoder"]["BatchNorm_0"]["mean"]),
        np.asarray(qv2.variables["batch_stats"]["encoder"]["BatchNorm_0"]["mean"]),
    )


def test_qat_reteaching_guard(tiny, tmp_path):
    """Chained fine-tunes without an explicit teacher re-teach from the
    drifted bundle — measured to diverge (0.025 -> 0.53 over four calls,
    BASELINE.md r4).  qat_finetune marks its output with the teacher
    fingerprint and REFUSES a second call that omits teacher_variables;
    passing the original floats explicitly resumes fine.  The marker
    survives save/load so reloaded bundles stay guarded."""
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.quantized import (
        load_quantized,
        params_fingerprint,
        qat_finetune,
        quantize_vae,
        save_quantized,
    )

    model, variables, _ = tiny
    calib, _, _ = simulate_batch(jax.random.PRNGKey(3), 8, stamp=23, bands=3)
    qv = quantize_vae(model, variables, calib)
    assert qv.teacher_fingerprint is None  # fresh PTQ bundle: unguarded

    # steps below steps_per_dispatch exercises the exact-budget final chunk
    qv2 = qat_finetune(qv, steps=4, batch=8, steps_per_dispatch=10)
    assert qv2.teacher_fingerprint == params_fingerprint(
        variables["params"]
    )

    with pytest.raises(ValueError, match="re-teach"):
        qat_finetune(qv2, steps=4, batch=8, steps_per_dispatch=10)

    # explicit original teacher resumes
    qv3 = qat_finetune(
        qv2, steps=4, batch=8, steps_per_dispatch=10,
        teacher_variables=variables,
    )
    assert qv3.teacher_fingerprint == qv2.teacher_fingerprint

    save_quantized(qv2, tmp_path / "bundle")
    reloaded = load_quantized(tmp_path / "bundle")
    assert reloaded.teacher_fingerprint == qv2.teacher_fingerprint
    with pytest.raises(ValueError, match="re-teach"):
        qat_finetune(reloaded, steps=4, batch=8, steps_per_dispatch=10)


def test_packaged_int8_bundle_is_guarded():
    """The shipped sim_demo_int8 bundle was QAT'd; its metadata must carry
    the teacher fingerprint so users who reload and fine-tune it hit the
    re-teaching guard instead of the measured divergence."""
    from pathlib import Path

    from debvader_tpu.models.quantized import load_quantized
    from debvader_tpu.training.checkpoint import default_weights_dir

    qv = load_quantized(Path(default_weights_dir()) / "sim_demo_int8")
    assert qv.teacher_fingerprint is not None


def test_packaged_int8_bundle_serves():
    """The shipped QAT'd sim_demo_int8 bundle loads and serves: finite
    outputs, and int8-vs-its-own-float-forward divergence within the
    measured envelope (BASELINE.md r4: mean 2.5e-2 on held-out sims;
    loose 2x bound here on a small batch)."""
    from pathlib import Path

    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.quantized import load_quantized, quantized_forward
    from debvader_tpu.training.checkpoint import default_weights_dir

    import debvader_tpu as dt

    bundle = Path(default_weights_dir()) / "sim_demo_int8"
    qv = load_quantized(bundle)
    assert qv.cfg.stamp_size == 59 and len(qv.qweights) == 18
    x, _, _ = simulate_batch(jax.random.PRNGKey(123), 16)
    dq, _ = quantized_forward(qv, x, jax.random.PRNGKey(0), z_mode="mean")
    assert np.isfinite(np.asarray(dq.loc)).all()
    # The meaningful comparator is the ORIGINAL sim_demo float forward —
    # the QAT distillation teacher.  (The bundle's own quant=False fallback
    # is the fine-tuned floats, which deliberately drifted toward the int8
    # grid; int8-vs-them measures the drift, ~0.19, not the serving error.)
    model, variables = dt.load_deblender("sim_demo")
    dist_f, _ = model.apply(variables, x, z_mode="mean")
    fq = np.asarray(dq.loc, np.float64).sum(axis=(1, 2, 3))
    ff = np.asarray(dist_f.loc, np.float64).sum(axis=(1, 2, 3))
    rel = np.abs(fq - ff) / np.maximum(np.abs(ff), 1e-9)
    assert rel.mean() < 5e-2


def test_per_channel_act_scales(tiny, tmp_path):
    """r5 per-channel activation granularity (VERDICT r4 #5): scales are
    per-input-channel vectors folded into the weight quantization, so the
    serving path's dequant algebra is unchanged; the folded grid
    dequantizes each (cin, cout) weight to (w*s_in rounded)/s_in; bundles
    roundtrip with their granularity; QAT requantization reproduces the
    folded grid."""
    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.quantized import (
        load_quantized,
        qat_finetune,
        quantize_vae,
        quantized_forward,
        save_quantized,
    )

    model, variables, _ = tiny
    calib, _, _ = simulate_batch(jax.random.PRNGKey(3), 16, stamp=23, bands=3)
    qv = quantize_vae(model, variables, calib, act_granularity="per_channel")
    # vector scales with the layer's input-channel extent
    assert qv.act_scales["enc/Conv_0"].shape == (3,)
    assert qv.act_scales["enc/Conv_1"].shape == (TINY.filters[0],)
    assert qv.act_granularity == "per_channel"

    # folded grid: dequantized weight == round(w*s_in/ws)*ws / s_in
    name = "enc/Conv_1"
    k = np.asarray(
        qv.variables["params"]["encoder"]["Conv_1"]["kernel"], np.float64
    )
    s_in = np.asarray(qv.act_scales[name], np.float64)[None, None, :, None]
    qk, ws = (np.asarray(a, np.float64) for a in qv.qweights[name])
    np.testing.assert_allclose(
        qk, np.clip(np.round(k * s_in / ws), -127, 127), atol=1e-6
    )

    x, _, _ = simulate_batch(jax.random.PRNGKey(9), 8, stamp=23, bands=3)
    dist, _ = quantized_forward(qv, x, jax.random.PRNGKey(0), z_mode="mean")
    assert np.isfinite(np.asarray(dist.loc)).all()

    # per-channel resolution is at least as accurate as per-tensor on the
    # calibration distribution (it strictly refines the activation grid)
    qv_t = quantize_vae(model, variables, calib)
    ref, _ = quantized_forward(
        qv, x, jax.random.PRNGKey(0), z_mode="mean", quant=False
    )
    err_c = float(jnp.mean(jnp.square(dist.loc - ref.loc)))
    dist_t, _ = quantized_forward(qv_t, x, jax.random.PRNGKey(0), z_mode="mean")
    err_t = float(jnp.mean(jnp.square(dist_t.loc - ref.loc)))
    assert err_c < err_t * 1.5  # no catastrophic regression; usually better

    # roundtrip keeps granularity + forward equality
    save_quantized(qv, tmp_path / "pc")
    qv2 = load_quantized(tmp_path / "pc")
    assert qv2.act_granularity == "per_channel"
    dist2, _ = quantized_forward(qv2, x, jax.random.PRNGKey(0), z_mode="mean")
    np.testing.assert_array_equal(np.asarray(dist.loc), np.asarray(dist2.loc))

    # QAT on a per-channel bundle: requantization reproduces the folded
    # grid (scales kept), fake-quant training step runs, error moves down
    qv3 = qat_finetune(
        qv, steps=20, batch=16, learning_rate=1e-3, steps_per_dispatch=10
    )
    assert qv3.act_granularity == "per_channel"
    for kname in qv.act_scales:
        np.testing.assert_array_equal(
            np.asarray(qv.act_scales[kname]), np.asarray(qv3.act_scales[kname])
        )
    dist3, _ = quantized_forward(qv3, x, jax.random.PRNGKey(0), z_mode="mean")
    err3 = float(jnp.mean(jnp.square(dist3.loc - ref.loc)))
    assert err3 < err_c


def test_per_channel_constant_scales_match_per_tensor(tiny):
    """Algebra pin for the folded per-channel grid: forcing every
    per-channel activation-scale vector to its layer's scalar (max)
    reproduces the per-tensor bundle's int8 forward (identical q-kernels,
    wscales differing by exactly the folded factor)."""
    import dataclasses

    model, variables, x = tiny
    qv_t = q.quantize_vae(model, variables, x, rng=jax.random.PRNGKey(1))
    qv_c = q.quantize_vae(
        model, variables, x, rng=jax.random.PRNGKey(1),
        act_granularity="per_channel",
    )
    # overwrite the per-channel vectors with constant = the per-tensor
    # scalar, requantize through the folded path
    const_scales = {
        k: jnp.full_like(qv_c.act_scales[k], qv_t.act_scales[k])
        for k in qv_c.act_scales
    }
    qweights = {}
    for name in qv_c.qweights:
        scope, layer = name.split("/")
        p = variables["params"]["encoder" if scope == "enc" else "decoder"][layer]
        if layer.startswith("ConvTranspose"):
            oa, ia = 2, 3
        elif layer.startswith("Conv"):
            oa, ia = 3, 2
        else:
            oa, ia = 1, 0
        qweights[name] = q._quant_weight_folded(
            p["kernel"], oa, ia, const_scales[name]
        )
    qv_c2 = dataclasses.replace(
        qv_c, act_scales=const_scales, qweights=qweights
    )
    a, _ = q.quantized_forward(qv_t, x, jax.random.PRNGKey(0), z_mode="mean")
    b, _ = q.quantized_forward(qv_c2, x, jax.random.PRNGKey(0), z_mode="mean")
    np.testing.assert_allclose(
        np.asarray(a.loc), np.asarray(b.loc), rtol=1e-5, atol=1e-7
    )
