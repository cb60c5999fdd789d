"""Round-3 hardening: device-field cache invalidation under sum-neutral
edits, render_pad validation, donate=False step factories."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.pipeline.field import DeblendField

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


def _df():
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    field = np.random.default_rng(0).normal(size=(1, 64, 64, 3)).astype(np.float32)
    return DeblendField((model, variables), field, cutout_size=23, nb_of_bands=3)


def test_device_field_cache_hits_on_unchanged():
    df = _df()
    a = df._device_field(df.field_image)
    b = df._device_field(df.field_image)
    assert a is b


def test_device_field_invalidates_on_sum_neutral_edit():
    """Swapping flux between two pixels preserves nansum and NaN count; the
    position-sensitive checksum must still invalidate (VERDICT r2 item 8)."""
    df = _df()
    img = df.field_image
    a = df._device_field(img)
    # sum-neutral: +x here, -x there (in place on the SAME ndarray)
    img[0, 3, 5, 0] += 1.25
    img[0, 40, 17, 1] -= 1.25
    b = df._device_field(img)
    assert a is not b
    np.testing.assert_allclose(np.asarray(b), img, rtol=1e-6)


def test_device_field_invalidates_on_pixel_swap():
    df = _df()
    img = df.field_image
    a = df._device_field(img)
    img[0, 0, 0, 0], img[0, 10, 10, 0] = float(img[0, 10, 10, 0]), float(img[0, 0, 0, 0])
    b = df._device_field(img)
    assert a is not b


def test_device_field_keyed_on_dtype():
    df = _df()
    img64 = df.field_image[0].astype(np.float64)
    k32 = df._field_checksum(df.field_image[0])
    k64 = df._field_checksum(img64)
    # checksums agree (same values) but the full key includes dtype
    np.testing.assert_allclose(k32[0], k64[0], rtol=1e-5)


def test_render_pad_rejects_unsupported_order():
    from debvader_tpu.ops.shift import render_pad

    assert render_pad(59, 1) == 61
    assert render_pad(59, 3) == 79
    with pytest.raises(ValueError):
        render_pad(59, 2)


def test_train_step_donate_false_allows_reuse():
    """donate=False: a caller may keep the pre-step state (best-checkpoint
    pattern) without deleted-buffer errors."""
    from debvader_tpu.training.train import create_train_state, make_train_step

    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3, batch_size=4)
    state = create_train_state(model, cfg)
    step = make_train_step(model, cfg, donate=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 23, 23, 3)), jnp.float32)
    best = state
    state, _ = step(state, x, x)
    # the pre-step state's buffers are still alive and readable
    leaves = jax.tree_util.tree_leaves(best.params)
    assert np.isfinite(float(jnp.sum(leaves[0])))


def test_serving_timings_recorded():
    """deblend_and_render(timings=...) reports per-stage wall times
    (VERDICT r2 item 6)."""
    df = _df()
    centers = np.array([[0.0, 0.0], [5.0, -4.0]])
    t = {}
    catalog, residual = df.deblend_and_render(centers, timings=t)
    assert {"upload", "deblend_render", "field_download"} <= set(t)
    assert all(v >= 0 for v in t.values())
    assert df.serving_timings is t
