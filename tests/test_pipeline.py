"""Routed expert restorer: dispatch semantics + expert sharding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_degradation_image_enhancement_tpu.pipeline import (
    RoutedRestorer,
    stack_expert_variables,
)
from tests.tiny_net import TinyNet


@pytest.fixture(scope="module")
def bank():
    net = TinyNet()
    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    variables = [net.init({"params": jax.random.key(i)}, x, train=False) for i in range(3)]
    return net, ["noise", "blur", "low_light"], stack_expert_variables(variables)


def test_top1_routes_to_argmax_expert(bank):
    net, names, stacked = bank
    x = jnp.asarray(np.random.RandomState(0).rand(6, 16, 24, 3), jnp.float32)
    probs = jnp.asarray(
        [[0.9, 0.1, 0.1], [0.1, 0.8, 0.2], [0.0, 0.1, 0.7]] * 2, jnp.float32
    )
    router = RoutedRestorer(net, names, stacked, mode="top1")
    out = router(x, probs, [0.5, 0.5, 0.5])
    for i in range(6):
        e = int(jnp.argmax(probs[i]))
        direct = net.apply(jax.tree.map(lambda v: v[e], stacked), x[i : i + 1], train=False)
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(direct[0]), atol=1e-5)


def test_clean_images_pass_through(bank):
    net, names, stacked = bank
    x = jnp.asarray(np.random.RandomState(1).rand(4, 16, 24, 3), jnp.float32)
    router = RoutedRestorer(net, names, stacked, mode="top1")
    out = router(x, jnp.full((4, 3), 0.1), [0.5, 0.5, 0.5])
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_sequential_mode_applies_in_order(bank):
    net, names, stacked = bank
    x = jnp.asarray(np.random.RandomState(2).rand(2, 16, 24, 3), jnp.float32)
    router = RoutedRestorer(net, names, stacked, mode="sequential")
    probs = jnp.asarray([[0.9, 0.9, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    out = router(x, probs, [0.5, 0.5, 0.5])
    # sample 0: expert0 then expert1 applied in order
    step0 = net.apply(jax.tree.map(lambda v: v[0], stacked), x[:1], train=False)
    step1 = net.apply(jax.tree.map(lambda v: v[1], stacked), step0, train=False)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(step1[0]), atol=1e-5)
    # sample 1: untouched
    np.testing.assert_array_equal(np.asarray(out[1]), np.asarray(x[1]))


def test_invalid_mode_raises(bank):
    net, names, stacked = bank
    with pytest.raises(ValueError):
        RoutedRestorer(net, names, stacked, mode="bogus")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_expert_parallel_sharding(bank):
    """Expert bank sharded over an 'expert' mesh axis still routes correctly."""
    from multi_degradation_image_enhancement_tpu.parallel.mesh import create_mesh

    net = TinyNet()
    x = jnp.zeros((1, 16, 24, 3), jnp.float32)
    variables = [net.init({"params": jax.random.key(i)}, x, train=False) for i in range(4)]
    stacked = stack_expert_variables(variables)
    mesh = create_mesh({"expert": 4, "data": 2})
    names = ["a", "b", "c", "d"]
    router = RoutedRestorer(net, names, stacked, mode="top1", mesh=mesh)
    xb = jnp.asarray(np.random.RandomState(3).rand(8, 16, 24, 3), jnp.float32)
    probs = jax.nn.one_hot(jnp.arange(8) % 4, 4)
    out = router(xb, probs, [0.5] * 4)
    for i in range(8):
        e = i % 4
        direct = net.apply(
            jax.tree.map(lambda v: v[e], stacked), xb[i : i + 1], train=False
        )
        np.testing.assert_allclose(np.asarray(out[i]), np.asarray(direct[0]), atol=1e-4)


def test_expert_bank_pads_to_mesh_axis(bank):
    """A 3-expert bank on a 2-way expert axis pads to 4 (dummy experts get
    all-zero dispatch columns) and routes exactly like the unsharded bank."""
    from multi_degradation_image_enhancement_tpu.parallel.mesh import create_mesh

    net, names, stacked = bank
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    mesh = create_mesh({"data": 2, "expert": 2}, jax.devices()[:4])
    x = jnp.asarray(np.random.RandomState(3).rand(6, 16, 24, 3), jnp.float32)
    probs = jnp.asarray(
        [[0.9, 0.1, 0.1], [0.1, 0.8, 0.2], [0.0, 0.1, 0.7]] * 2, jnp.float32
    )
    plain = RoutedRestorer(net, names, stacked, mode="top1")
    sharded = RoutedRestorer(net, names, stacked, mode="top1", mesh=mesh)
    assert sharded.n_pad == 1
    a = plain(x, probs, [0.5, 0.5, 0.5])
    b = sharded(x, probs, [0.5, 0.5, 0.5])
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sequential_severity_ordering(bank):
    """ordering="severity": application order follows the severity head.

    VERDICT r4 item 7 — the reference composes degradations in pipeline-order
    templates (/root/reference/datasets_generation/generate_classifier_dataset.py:85-92);
    sequential restoration order matters (wrong order costs up to −10.2 dB,
    PERF.md round 4), so the bank can order by per-expert mean active
    severity instead of fixed bank order.
    """
    net, names, stacked = bank
    x = jnp.asarray(np.random.RandomState(5).rand(2, 16, 24, 3), jnp.float32)
    probs = jnp.asarray([[0.9, 0.9, 0.0], [0.9, 0.9, 0.0]], jnp.float32)
    thr = [0.5, 0.5, 0.5]
    # expert1 has higher severity than expert0 -> applied first
    sevs = jnp.asarray([[0.2, 0.8, 0.0], [0.2, 0.8, 0.0]], jnp.float32)

    router = RoutedRestorer(net, names, stacked, mode="sequential",
                            ordering="severity")
    out = router(x, probs, thr, severities=sevs)
    step1 = net.apply(jax.tree.map(lambda v: v[1], stacked), x, train=False)
    step0 = net.apply(jax.tree.map(lambda v: v[0], stacked), step1, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(step0), atol=1e-5)

    # ascending control reverses the order
    router_asc = RoutedRestorer(net, names, stacked, mode="sequential",
                                ordering="severity_asc")
    out_asc = router_asc(x, probs, thr, severities=sevs)
    s0 = net.apply(jax.tree.map(lambda v: v[0], stacked), x, train=False)
    s01 = net.apply(jax.tree.map(lambda v: v[1], stacked), s0, train=False)
    np.testing.assert_allclose(np.asarray(out_asc), np.asarray(s01), atol=1e-5)
    assert not np.allclose(np.asarray(out), np.asarray(out_asc))

    # without severities: falls back to bank order (== fixed-order router)
    fixed = RoutedRestorer(net, names, stacked, mode="sequential")
    np.testing.assert_allclose(
        np.asarray(router(x, probs, thr)),
        np.asarray(fixed(x, probs, thr)), atol=1e-6,
    )

    # bad ordering name raises
    with pytest.raises(ValueError, match="ordering"):
        RoutedRestorer(net, names, stacked, mode="sequential", ordering="bogus")
