"""Weight-importer tests: the bundled DC2 checkpoint index is the golden
architecture contract — every mapped name must exist with exactly the shape
our modules allocate; export->import must round-trip."""

from pathlib import Path

import jax
import numpy as np
import pytest

from debvader_tpu.config import ModelConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.utils.tf_checkpoint import load_available_tensors, read_index
from debvader_tpu.utils.weight_import import (
    export_to_tensors,
    import_from_tensors,
    keras_name_map,
)

CKPT = Path(
    "/root/reference/src/debvader/data/weights/dc2/weights_noisy_v4.386--6.61.ckpt"
)


@pytest.fixture(scope="module")
def index():
    return read_index(str(CKPT) + ".index")


@pytest.fixture(scope="module")
def variables():
    return init_vae(DeblenderVAE(ModelConfig()), jax.random.PRNGKey(0))


def test_index_parses_all_keys(index):
    assert len(index) == 194  # full bundle incl. optimizer slots
    model_keys = [
        k
        for k in index
        if "VARIABLE_VALUE" in k
        and ".OPTIMIZER_SLOT" not in k
        and not k.startswith("optimizer")
    ]
    assert len(model_keys) == 64  # 31 encoder + 33 decoder tensors


def test_name_map_covers_checkpoint_exactly(index):
    """Bijection between our mapped names and the reference's model
    tensors."""
    name_map = keras_name_map()
    ckpt_model_keys = {
        k
        for k in index
        if "VARIABLE_VALUE" in k
        and ".OPTIMIZER_SLOT" not in k
        and not k.startswith("optimizer")
    }
    assert set(name_map) == ckpt_model_keys


def test_mapped_shapes_match_our_modules(index, variables):
    """Golden shape test: ckpt index shape == our allocated param shape for
    all 64 tensors (SURVEY.md §7 step 2 contract)."""
    from debvader_tpu.utils.weight_import import _get_path

    name_map = keras_name_map()
    for tf_key, path in name_map.items():
        want = tuple(index[tf_key].shape)
        got = tuple(np.shape(_get_path(variables[path[0]], path[1:])))
        assert got == want, f"{tf_key}: ours {got} != ckpt {want}"


def test_total_parameter_count_from_index(index):
    n = sum(
        int(np.prod(e.shape))
        for k, e in index.items()
        if "VARIABLE_VALUE" in k
        and ".OPTIMIZER_SLOT" not in k
        and not k.startswith("optimizer")
    )
    assert n == 8_318_452


def test_export_import_roundtrip(variables):
    tensors = export_to_tensors(variables)
    assert len(tensors) == 64
    back = import_from_tensors(tensors)
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    for path, leaf in flat_a:
        node = back["params"]
        for p in path:
            node = node[p.key]
        np.testing.assert_array_equal(np.asarray(leaf), node)


def test_partial_snapshot_loads_shard0_only():
    # the snapshot strips shard 1; loader must skip gracefully
    tensors = load_available_tensors(CKPT)
    assert isinstance(tensors, dict)  # whatever shard-0 holds (may be empty)
    with pytest.raises(KeyError):
        import_from_tensors(tensors, strict=True)


def test_bf16_tensor_decodes_by_widening(tmp_path):
    """bf16 ckpt tensors materialize as float32 values, never raw uint16."""
    from debvader_tpu.utils.tf_checkpoint import BundleEntry, read_tensor

    want = np.array([1.5, -2.0, 0.0, 3.25], np.float32)
    bf16_bits = (want.view(np.uint32) >> 16).astype("<u2")  # exact in bf16
    shard = tmp_path / "w.ckpt.data-00000-of-00001"
    shard.write_bytes(bf16_bits.tobytes())
    entries = {
        "t": BundleEntry(dtype=14, shape=(4,), shard_id=0, offset=0, size=8)
    }
    got = read_tensor(tmp_path / "w.ckpt", "t", entries)
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_import_applies_values(variables):
    tensors = export_to_tensors(variables)
    tensors = {k: v + 1.0 for k, v in tensors.items()}
    back = import_from_tensors(tensors)
    k = "layer_with_weights-0/layer_with_weights-1/kernel/.ATTRIBUTES/VARIABLE_VALUE"
    np.testing.assert_allclose(
        back["params"]["encoder"]["Conv_0"]["kernel"],
        np.asarray(variables["params"]["encoder"]["Conv_0"]["kernel"]) + 1.0,
    )


def test_sim_demo_golden_forward_outputs():
    """Golden-output regression pinned to the shipped sim_demo weights on
    the bundled DC2 stamps (deterministic z_mode='mean' forward): any
    numerics drift in conv/BN/PReLU/TriL/decoder arithmetic — or a silent
    change to the packaged checkpoint — moves these values (VERDICT r1
    item 7; the dc2 value-parity check is env-blocked, shard 1 stripped).
    Golden values generated on XLA CPU fp32."""
    import debvader_tpu as dt

    stamps = np.load("/root/reference/src/debvader/data/dc2_imgs/imgs_dc2.npy")
    model, variables = dt.load_deblender("sim_demo")
    dist, post = model.apply(
        variables, jax.numpy.asarray(stamps, jax.numpy.float32), z_mode="mean"
    )
    loc, scale = np.asarray(dist.loc), np.asarray(dist.scale)
    zloc = np.asarray(post.mean())
    assert loc.shape == (10, 59, 59, 6)
    np.testing.assert_allclose(loc.sum(), 1763.6484, rtol=1e-4)
    np.testing.assert_allclose(scale.sum(), 290.38025, rtol=1e-4)
    np.testing.assert_allclose(zloc.sum(), -31.350805, rtol=1e-4)
    golden = {
        (0, 29, 29, 2): (1.4219792, 0.14408506),
        (3, 30, 28, 0): (0.40112355, 0.08850836),
        (7, 25, 33, 5): (0.10578227, 0.023512967),
        (9, 29, 29, 3): (0.68706632, 0.056985065),
    }
    for p, (gl, gs) in golden.items():
        np.testing.assert_allclose(loc[p], gl, rtol=1e-4, atol=1e-9)
        np.testing.assert_allclose(scale[p], gs, rtol=1e-4)
    np.testing.assert_allclose(
        zloc[0, :4],
        [-0.09396201, -2.2138171, -0.09435119, -0.08364076],
        rtol=1e-4,
    )


def test_packaged_sim_demo_weights_load():
    """The framework ships trained demo weights (load_deblender('sim_demo')
    — the reference ships 'dc2'); verify the packaged load path."""
    from debvader_tpu.training.checkpoint import default_weights_dir, load_deblender

    if not (default_weights_dir() / "sim_demo").exists():
        pytest.skip("sim_demo weights not present")
    model, variables2 = load_deblender("sim_demo")
    n = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables2))
    assert n == 8_318_452
