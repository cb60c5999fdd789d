"""Native C++ data loader tests: build, correctness, dtype conversion,
shuffling determinism, epoch coverage, fallback parity."""

import numpy as np
import pytest

from debvader_tpu.runtime.loader import (
    NativeNpyLoader,
    NumpyLoader,
    make_loader,
    native_available,
)


@pytest.fixture(scope="module")
def npy_pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    x = rng.normal(size=(200, 9, 9, 2))  # float64: loader must downconvert
    y = x * 0.5
    xp, yp = d / "x.npy", d / "y.npy"
    np.save(xp, x)
    np.save(yp, y)
    return xp, yp, x, y


needs_native = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable"
)


@needs_native
def test_native_batches_match_source(npy_pair):
    xp, yp, x, y = npy_pair
    ld = NativeNpyLoader(xp, yp, 16, shuffle=False, seed=0)
    bx, by = ld.next_batch()
    assert bx.shape == (16, 9, 9, 2) and bx.dtype == np.float32
    np.testing.assert_allclose(bx, x[:16].astype(np.float32))
    np.testing.assert_allclose(by, y[:16].astype(np.float32))
    ld.close()


@needs_native
def test_native_shuffle_covers_epoch(npy_pair):
    xp, yp, x, _ = npy_pair
    ld = NativeNpyLoader(xp, yp, 20, shuffle=True, seed=3)
    seen = []
    for _ in range(len(ld)):  # one epoch
        bx, _ = ld.next_batch()
        seen.append(bx)
    ld.close()
    got = np.sort(np.concatenate(seen).sum(axis=(1, 2, 3)))
    want = np.sort(x.astype(np.float32).sum(axis=(1, 2, 3)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@needs_native
def test_native_deterministic_given_seed(npy_pair):
    xp, yp, _, _ = npy_pair
    a = NativeNpyLoader(xp, yp, 16, shuffle=True, seed=11)
    b1, _ = a.next_batch()
    a.close()
    b = NativeNpyLoader(xp, yp, 16, shuffle=True, seed=11)
    b2, _ = b.next_batch()
    b.close()
    np.testing.assert_array_equal(b1, b2)


@needs_native
def test_native_open_errors(npy_pair, tmp_path):
    xp, yp, _, _ = npy_pair
    with pytest.raises(RuntimeError):
        NativeNpyLoader(tmp_path / "missing.npy", yp, 16)
    # batch size larger than rows
    with pytest.raises(RuntimeError):
        NativeNpyLoader(xp, yp, 10_000)


@needs_native
def test_native_y_shape_differs_from_x(tmp_path):
    """Labels with their own per-row shape reshape with y's tail dims."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(64, 5, 5, 2))
    y = rng.normal(size=(64, 3)).astype(np.float32)
    xp, yp = tmp_path / "x.npy", tmp_path / "y.npy"
    np.save(xp, x)
    np.save(yp, y)
    ld = NativeNpyLoader(xp, yp, 8, shuffle=False, seed=0)
    bx, by = ld.next_batch()
    assert bx.shape == (8, 5, 5, 2)
    assert by.shape == (8, 3)
    np.testing.assert_allclose(by, y[:8])
    ld.close()


@needs_native
def test_native_rejects_unsupported_dtype(tmp_path):
    """float16 / bool / big-endian archives error at open, never zero-fill."""
    good = np.zeros((16, 4), np.float32)
    xp = tmp_path / "x.npy"
    np.save(xp, good)
    for bad in (
        np.zeros((16, 4), np.float16),
        np.zeros((16, 4), bool),
        np.zeros((16, 4), ">f4"),
        np.zeros((16, 4), np.int64),
    ):
        bp = tmp_path / "bad.npy"
        np.save(bp, bad)
        with pytest.raises(RuntimeError, match="unsupported dtype"):
            NativeNpyLoader(xp, bp, 4)


def test_numpy_fallback_contract(npy_pair):
    _, _, x, y = npy_pair
    ld = NumpyLoader(x, y, 16, shuffle=True, seed=0)
    bx, by = ld.next_batch()
    assert bx.shape == (16, 9, 9, 2) and bx.dtype == np.float32
    assert len(ld) == 12
    ld.close()


def test_make_loader_dispatch(npy_pair):
    xp, yp, x, y = npy_pair
    ld = make_loader(x, y, 8)
    assert isinstance(ld, NumpyLoader)
    ld2 = make_loader(xp, yp, 8)
    if native_available():
        assert isinstance(ld2, NativeNpyLoader)
    bx, _ = ld2.next_batch()
    assert bx.shape == (8, 9, 9, 2)
    ld2.close()


@needs_native
def test_train_network_with_native_loader(npy_pair):
    """train_network accepts the prefetching loader in place of arrays."""
    import jax

    from debvader_tpu.config import ModelConfig, TrainConfig
    from debvader_tpu.models.vae import DeblenderVAE
    from debvader_tpu.training.train import create_train_state, train_network

    xp, yp, x, y = npy_pair
    cfg = ModelConfig(stamp_size=9, nb_of_bands=2, latent_dim=2, filters=(2,), kernels=(3,))
    model = DeblenderVAE(cfg)
    tcfg = TrainConfig(batch_size=16)
    state = create_train_state(model, tcfg)
    loader = NativeNpyLoader(xp, yp, 16, shuffle=True, seed=0)
    state, hist = train_network(
        model, state, 1, loader, (x[:16], y[:16]), 16, verbose=0, train_cfg=tcfg
    )
    assert np.isfinite(hist["loss"][0])
    loader.close()
