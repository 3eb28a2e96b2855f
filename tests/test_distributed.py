"""Multi-host bootstrap smoke: 2-process jax.distributed over CPU devices.

``parallel.distributed.initialize`` was previously first-run-in-production;
this exercises the real multi-process path — coordinator handshake, global
device view, a cross-process mesh, and a collective whose result proves both
processes' shards entered the reduction (gloo CPU collectives).

Also guards a production-breaking regression: importing the package must NOT
initialize the XLA backend (jax.distributed.initialize must be callable
after ``import multi_degradation_image_enhancement_tpu``).
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = textwrap.dedent(
    """
    import sys
    sys.path.insert(0, {repo!r})
    pid = int(sys.argv[1])

    # package import must leave the backend untouched
    import multi_degradation_image_enhancement_tpu  # noqa: F401
    from jax._src import xla_bridge
    assert not xla_bridge._backends, "package import initialized XLA backend"

    from multi_degradation_image_enhancement_tpu.parallel import distributed
    distributed.initialize("127.0.0.1:{port}", 2, pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P
    from multi_degradation_image_enhancement_tpu.parallel.mesh import create_mesh

    assert jax.process_count() == 2
    assert jax.device_count() == 2 * jax.local_device_count()
    assert distributed.is_primary() == (pid == 0)

    mesh = create_mesh({{"data": jax.device_count()}})
    local = np.full((jax.local_device_count(), 4), float(pid + 1), np.float32)
    garr = multihost_utils.host_local_array_to_global_array(local, mesh, P("data"))
    total = jax.jit(jnp.sum)(garr)
    got = float(multihost_utils.process_allgather(total.reshape(1), tiled=True)[0])
    want = 4.0 * jax.local_device_count() * (1.0 + 2.0)
    assert got == want, (got, want)
    print(f"pid={{pid}} ok total={{got}}")
    """
)


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    port = 12837
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER.format(repo=REPO, port=port))
    env = dict(os.environ)
    env["PYTHONPATH"] = ""  # shed the axon sitecustomize → real CPU backend
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i)],
            env=env, cwd=str(tmp_path),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"pid={i} ok total=24.0" in out
