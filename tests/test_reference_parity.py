"""Architecture parity: transplant reference CDAN weights → identical outputs.

The strongest structural-parity evidence available without training: build
the PyTorch reference network (mounted read-only at /root/reference),
randomize it, port its state_dict through ``utils.torch_port``, and assert
the Flax forward matches the torch forward on the same input (eval mode).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "models")), reason="reference not mounted"
)


@pytest.fixture(scope="module")
def reference_cdan():
    sys.path.insert(0, REFERENCE)
    try:
        from models.cdan import CDAN as TorchCDAN  # reference impl as oracle
    finally:
        sys.path.remove(REFERENCE)
    torch.manual_seed(0)
    net = TorchCDAN()
    # randomize BN running stats too, so the port must carry them
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.6, 1.4)
    net.eval()
    return net


def test_reference_param_count(reference_cdan):
    n = sum(p.numel() for p in reference_cdan.parameters())
    assert n == 3_585_663


def test_weight_transplant_forward_parity(reference_cdan):
    import jax
    import jax.numpy as jnp

    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.utils.torch_port import port_reference_cdan

    rng = np.random.RandomState(0)
    x = rng.rand(2, 16, 24, 3).astype(np.float32)

    with torch.no_grad():
        ref = reference_cdan(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    ref = ref.numpy().transpose(0, 2, 3, 1)

    model = CDAN()
    variables = model.init({"params": jax.random.key(0)}, jnp.asarray(x), train=False)
    sd = {k: v.detach().numpy() for k, v in reference_cdan.state_dict().items()}
    ported = port_reference_cdan(sd, variables)

    got = np.asarray(model.apply(ported, jnp.asarray(x), train=False))
    assert got.shape == ref.shape
    # bit-for-bit is impossible across frameworks; demand tight agreement
    assert np.abs(got - ref).max() < 2e-4
    assert np.abs(got - ref).mean() < 2e-5


def test_port_rejects_shape_mismatch(reference_cdan):
    import jax
    import jax.numpy as jnp

    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.utils.torch_port import port_reference_cdan

    model = CDAN()
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 16, 24, 3)), train=False
    )
    sd = {k: v.detach().numpy() for k, v in reference_cdan.state_dict().items()}
    sd["encoder.conv1.conv.weight"] = sd["encoder.conv1.conv.weight"][:, :1]
    with pytest.raises((ValueError, KeyError)):
        port_reference_cdan(sd, variables)
