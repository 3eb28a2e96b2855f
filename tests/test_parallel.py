"""Mesh + sharding over 8 virtual CPU devices (the fake multi-chip harness)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from multi_degradation_image_enhancement_tpu.engine.model import make_train_step
from multi_degradation_image_enhancement_tpu.engine.state import TrainState
from multi_degradation_image_enhancement_tpu.ops.losses import build_loss_pipeline
from multi_degradation_image_enhancement_tpu.parallel import mesh as pmesh

from tests.tiny_net import TinyNet

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def test_create_mesh_shapes():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    m = pmesh.create_mesh({"data": -1})
    assert m.shape["data"] == 8
    m2 = pmesh.create_mesh({"data": 4, "spatial": 2})
    assert dict(m2.shape) == {"data": 4, "spatial": 2}
    with pytest.raises(ValueError):
        pmesh.create_mesh({"data": 3})
    with pytest.raises(ValueError):
        pmesh.create_mesh({"data": -1, "spatial": -1})


def _make_state(model, h, w, tx=None):
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, h, w, 3)),
        train=True,
    )
    return TrainState.create(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=tx if tx is not None else optax.adam(1e-3),
    )


@needs_8
def test_data_parallel_step_matches_single_device():
    """One DP step over the mesh must equal the same step on one device."""
    model = TinyNet()
    loss_pipe = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "mse", "weight": 1.0}]}
    )
    step = make_train_step(model, loss_pipe)

    rng = np.random.RandomState(0)
    inputs = jnp.asarray(rng.rand(8, 16, 24, 3), jnp.float32)
    targets = jnp.asarray(rng.rand(8, 16, 24, 3), jnp.float32)
    key = jax.random.key(0)

    # SGD so the param delta is exactly the gradient (Adam's first step is
    # ~sign(grad) and amplifies fp32 reduction-order noise near zero grads).
    tx = optax.sgd(0.1)

    # single device
    state1 = _make_state(model, 16, 24, tx)
    new1, loss1 = jax.jit(step)(state1, inputs, targets, key)

    # 8-way data parallel
    m = pmesh.create_mesh({"data": 8})
    state8 = pmesh.replicate(_make_state(model, 16, 24, tx), m)
    sharded_step = pmesh.shard_train_step(step, m)
    inp8, tgt8 = pmesh.shard_batch((inputs, targets), m)
    new8, loss8 = sharded_step(state8, inp8, tgt8, key)

    assert float(loss8["total"]) == pytest.approx(float(loss1["total"]), rel=1e-5)
    p1 = jax.tree.leaves(new1.params)
    p8 = jax.tree.leaves(jax.device_get(new8.params))
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


@needs_8
def test_data_spatial_mesh_compiles_and_runs():
    model = TinyNet()
    loss_pipe = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "charbonnier", "weight": 1.0, "args": {"eps": 1e-3}}]}
    )
    step = make_train_step(model, loss_pipe)
    m = pmesh.create_mesh({"data": 4, "spatial": 2})
    state = pmesh.replicate(_make_state(model, 32, 24), m)
    rng = np.random.RandomState(1)
    inputs = jnp.asarray(rng.rand(4, 32, 24, 3), jnp.float32)
    targets = jnp.asarray(rng.rand(4, 32, 24, 3), jnp.float32)
    inp, tgt = pmesh.shard_batch((inputs, targets), m)
    # H=32 shards 16 per device over 'spatial'; conv halos are XLA's job
    new_state, loss = pmesh.shard_train_step(step, m)(state, inp, tgt, jax.random.key(2))
    assert np.isfinite(float(loss["total"]))
    assert int(jax.device_get(new_state.step)) == 1


@needs_8
def test_spatial_sharded_step_matches_single_device():
    """data×spatial sharding must be numerically a no-op: conv halo exchanges
    and the sync-BN batch reduction XLA inserts have to reproduce the
    single-device step (not merely stay finite)."""
    model = TinyNet()
    loss_pipe = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "mse", "weight": 1.0}]}
    )
    step = make_train_step(model, loss_pipe)
    rng = np.random.RandomState(3)
    inputs = jnp.asarray(rng.rand(4, 32, 24, 3), jnp.float32)
    targets = jnp.asarray(rng.rand(4, 32, 24, 3), jnp.float32)
    key = jax.random.key(5)
    tx = optax.sgd(0.1)

    state1 = _make_state(model, 32, 24, tx)
    new1, loss1 = jax.jit(step)(state1, inputs, targets, key)

    m = pmesh.create_mesh({"data": 2, "spatial": 4})  # 8 rows of H per device
    state8 = pmesh.replicate(_make_state(model, 32, 24, tx), m)
    inp, tgt = pmesh.shard_batch((inputs, targets), m)
    new8, loss8 = pmesh.shard_train_step(step, m)(state8, inp, tgt, key)

    assert float(loss8["total"]) == pytest.approx(float(loss1["total"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(jax.device_get(new8.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
    # sync-BN: running stats must match the single-device (global-batch) stats
    for a, b in zip(
        jax.tree.leaves(new1.batch_stats), jax.tree.leaves(jax.device_get(new8.batch_stats))
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def _cdan_state_and_batch(h, w, batch):
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN

    model = CDAN()  # f32 on CPU
    variables = model.init(
        {"params": jax.random.key(0), "dropout": jax.random.key(1)},
        jnp.zeros((1, h, w, 3)),
        train=True,
    )
    state = TrainState.create(
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        tx=optax.sgd(0.05),
    )
    rng = np.random.RandomState(7)
    inputs = jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32)
    targets = jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32)
    return model, state, inputs, targets


@needs_8
@pytest.mark.slow  # two full CDAN compiles — minutes on the 1-core CPU host
def test_cdan_dp_step_matches_single_device():
    """The flagship CDAN (BN + dropout + CBAM) under 8-way DP must equal the
    single-device step — params AND BatchNorm running stats (sync-BN)."""
    model, state, inputs, targets = _cdan_state_and_batch(16, 24, 8)
    loss_pipe = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "mse", "weight": 1.0}]}
    )
    step = make_train_step(model, loss_pipe)
    key = jax.random.key(11)

    new1, loss1 = jax.jit(step)(state, inputs, targets, key)

    m = pmesh.create_mesh({"data": 8})
    _, state8, _, _ = _cdan_state_and_batch(16, 24, 8)
    state8 = pmesh.replicate(state8, m)
    inp, tgt = pmesh.shard_batch((inputs, targets), m)
    new8, loss8 = pmesh.shard_train_step(step, m)(state8, inp, tgt, key)

    assert float(loss8["total"]) == pytest.approx(float(loss1["total"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(jax.device_get(new8.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
    for a, b in zip(
        jax.tree.leaves(new1.batch_stats), jax.tree.leaves(jax.device_get(new8.batch_stats))
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


@needs_8
@pytest.mark.slow  # two full CDAN compiles — minutes on the 1-core CPU host
def test_cdan_spatial_sharded_matches_single_device():
    """CDAN with image height sharded 4-way: through three maxpools the deepest
    layer holds ONE row per device, so every 3×3 conv needs halo exchange and
    every BN a cross-device reduction — all of it must be numerically silent."""
    model, state, inputs, targets = _cdan_state_and_batch(32, 24, 4)
    loss_pipe = build_loss_pipeline(
        {"enabled": True, "terms": [{"name": "mse", "weight": 1.0}]}
    )
    step = make_train_step(model, loss_pipe)
    key = jax.random.key(13)

    new1, loss1 = jax.jit(step)(state, inputs, targets, key)

    m = pmesh.create_mesh({"data": 2, "spatial": 4})
    _, state8, _, _ = _cdan_state_and_batch(32, 24, 4)
    state8 = pmesh.replicate(state8, m)
    inp, tgt = pmesh.shard_batch((inputs, targets), m)
    new8, loss8 = pmesh.shard_train_step(step, m)(state8, inp, tgt, key)

    assert float(loss8["total"]) == pytest.approx(float(loss1["total"]), rel=1e-4)
    for a, b in zip(jax.tree.leaves(new1.params), jax.tree.leaves(jax.device_get(new8.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)
    for a, b in zip(
        jax.tree.leaves(new1.batch_stats), jax.tree.leaves(jax.device_get(new8.batch_stats))
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5)


@needs_8
@pytest.mark.slow  # full CDAN compile — minutes on the 1-core CPU host
def test_graft_dryrun_multichip(monkeypatch):
    import __graft_entry__ as graft

    # Stage 1 only: stages 2-3 re-run the same sharded train step at a
    # production shape / across 2 processes (~20 compile-minutes) — driver
    # breadth, exercised by the driver's own dryrun, not worth repeating
    # in CI.  Stage-3 machinery is covered by test_distributed.py.
    monkeypatch.setenv("MDIE_DRYRUN_STAGES", "1")
    graft.dryrun_multichip(8)
