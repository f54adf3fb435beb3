"""Shared distributed-bootstrap for the multi-process test workers.

Must be called BEFORE any jax device use: sets the launcher-contract env
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID), forces
4 virtual CPU devices per process, and pins the CPU backend (the axon
sitecustomize overrides JAX_PLATFORMS, so jax.config is required).
"""

import os
import sys


def setup(pid: str, nproc: str, port: str, ndev: int = 4) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={ndev}")
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"localhost:{port}"
    os.environ["JAX_NUM_PROCESSES"] = str(nproc)
    os.environ["JAX_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
