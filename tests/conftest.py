"""Test harness setup: hermetic CPU JAX with 8 virtual devices.

The container boots every interpreter with an ``axon`` TPU plugin via a
``sitecustomize`` on PYTHONPATH, which force-registers the TPU backend
before any test code runs and ignores ``JAX_PLATFORMS=cpu``.  Tests must be
CPU-deterministic and exercise multi-device sharding, so on first entry we
re-exec pytest once with a sanitized environment: no axon site,
``JAX_PLATFORMS=cpu``, and ``--xla_force_host_platform_device_count=8``
(the JAX-idiomatic fake multi-chip mechanism — SURVEY.md §4).

The re-exec happens in ``pytest_configure`` with global capture suspended,
so the replacement process writes to the real stdout/stderr.
"""

from __future__ import annotations

import os
import sys

_REEXEC_FLAG = "MDIE_TEST_REEXECED"


def _needs_reexec() -> bool:
    return (
        os.environ.get(_REEXEC_FLAG) != "1"
        and "axon_site" in os.environ.get("PYTHONPATH", "")
    )


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)
    env = dict(os.environ)
    env[_REEXEC_FLAG] = "1"
    env["PYTHONPATH"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    xla_flags = env.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla_flags:
        env["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *config.invocation_params.args], env)


if not _needs_reexec():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    if "host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
