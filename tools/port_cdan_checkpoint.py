#!/usr/bin/env python
"""Convert a trained reference CDAN checkpoint (.pt) to this framework's format.

A user of the PyTorch reference can bring their ``weights/CDAN_<task>.pt``
directly:

  python tools/port_cdan_checkpoint.py --pt weights/CDAN_noise.pt \
      --out weights/CDAN_noise.ported.pt

and then evaluate it with ``run.py -c config/noise.json -p test`` by
pointing ``test.model_name`` at the ported file.  Forward-output parity of
the port is covered by tests/test_reference_parity.py (≤2e-4).
Requires torch (CPU is fine) to read the .pt file.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", required=True, help="reference state_dict .pt file")
    ap.add_argument("--out", required=True, help="output weights file (engine format)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from multi_degradation_image_enhancement_tpu.engine.checkpoint import save_weights
    from multi_degradation_image_enhancement_tpu.models.cdan import CDAN
    from multi_degradation_image_enhancement_tpu.utils.torch_port import (
        numpy_state_dict,
        port_reference_cdan,
    )

    model = CDAN()
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 16, 24, 3), jnp.float32), train=False
    )
    sd = numpy_state_dict(args.pt)
    ported = port_reference_cdan(sd, variables)
    save_weights(args.out, ported["params"], ported["batch_stats"])
    print(f"[OK] ported {args.pt} -> {args.out}")


if __name__ == "__main__":
    main()
