"""Multi-device tests on the 8-way virtual CPU mesh: sharded training step,
TP param sharding rules, sharded inference fan-out, and parity between the
sharded and single-device steps."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from debvader_tpu.config import ModelConfig, TrainConfig
from debvader_tpu.models.vae import DeblenderVAE, init_vae
from debvader_tpu.parallel import (
    batch_sharding,
    create_sharded_train_state,
    make_mesh,
    make_sharded_apply,
    make_sharded_train_step,
    param_shardings,
    shard_batch,
)
from debvader_tpu.training.train import create_train_state, make_train_step

TINY = ModelConfig(stamp_size=23, nb_of_bands=3, latent_dim=4, filters=(4, 8), kernels=(3, 3))


def _toy(n, cfg=TINY, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.normal(size=(n, cfg.stamp_size, cfg.stamp_size, cfg.nb_of_bands))
    x = y + 0.1 * rng.normal(size=y.shape)
    return x.astype(np.float32), y.astype(np.float32)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    mesh2 = make_mesh(model_parallel=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["model"] == 2


def test_param_shardings_tp_rule():
    model = DeblenderVAE(ModelConfig())  # full-size: has the 4096x560 dense
    variables = init_vae(model, jax.random.PRNGKey(0))
    mesh = make_mesh(model_parallel=2)
    shardings = param_shardings(variables["params"], mesh)
    flat = jax.tree_util.tree_leaves_with_path(shardings)
    tp = [s for _, s in flat if s.spec == P(None, "model")]
    rep = [s for _, s in flat if s.spec == P()]
    # exactly the heavy dense kernels are TP-sharded
    assert len(tp) >= 2
    assert len(rep) > len(tp)


def test_sharded_train_step_runs_and_decreases():
    mesh = make_mesh()  # 8-way data parallel
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3, batch_size=16, seed=0)
    state = create_sharded_train_state(model, mesh, cfg)
    step = make_sharded_train_step(model, mesh, cfg)
    x, y = _toy(16)
    xb, yb = shard_batch(jnp.asarray(x), mesh), shard_batch(jnp.asarray(y), mesh)
    first = last = None
    for i in range(10):
        state, terms = step(state, xb, yb)
        if i == 0:
            first = float(terms["loss"])
        last = float(terms["loss"])
    assert np.isfinite(last) and last < first


def test_sharded_matches_single_device():
    # Same seed, same data: the dp-sharded step must track the single-device
    # step closely (XLA reduction order may differ at float32 epsilon).
    model = DeblenderVAE(TINY)
    cfg = TrainConfig(learning_rate=1e-3, batch_size=16, seed=0)
    x, y = _toy(16, seed=2)

    s1 = create_train_state(model, cfg)
    step1 = make_train_step(model, cfg)
    for _ in range(3):
        s1, t1 = step1(s1, jnp.asarray(x), jnp.asarray(y))

    mesh = make_mesh()
    s2 = create_sharded_train_state(model, mesh, cfg)
    step2 = make_sharded_train_step(model, mesh, cfg)
    xb, yb = shard_batch(jnp.asarray(x), mesh), shard_batch(jnp.asarray(y), mesh)
    for _ in range(3):
        s2, t2 = step2(s2, xb, yb)

    np.testing.assert_allclose(float(t1["loss"]), float(t2["loss"]), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_sharded_tp_dp_train_step():
    # 4-way data x 2-way model on the full-size architecture: validates the
    # TP collectives compile and execute.
    mesh = make_mesh(model_parallel=2)
    model = DeblenderVAE(ModelConfig(dtype="float32"))
    cfg = TrainConfig(batch_size=8, seed=0)
    state = create_sharded_train_state(model, mesh, cfg)
    step = make_sharded_train_step(model, mesh, cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 59, 59, 6)), jnp.float32)
    state, terms = step(state, shard_batch(x, mesh), shard_batch(x, mesh))
    assert np.isfinite(float(terms["loss"]))


def test_sharded_inference_fanout():
    mesh = make_mesh()
    model = DeblenderVAE(TINY)
    variables = init_vae(model, jax.random.PRNGKey(0))
    apply = make_sharded_apply(model, mesh)
    x, _ = _toy(32)
    dist = apply(variables, shard_batch(jnp.asarray(x), mesh), jax.random.PRNGKey(1))
    assert dist.loc.shape == (32, 23, 23, 3)
    # output is sharded over data on the mesh
    assert dist.loc.sharding.is_equivalent_to(batch_sharding(mesh), dist.loc.ndim)
