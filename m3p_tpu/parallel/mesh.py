"""Device mesh construction and distributed runtime bootstrap.

TPU-native replacement for the reference's SLURM/NCCL process-group init
(`/root/reference/M3P/src/slurm.py:46-170`, SURVEY.md §2.4): instead of ranks
and env:// rendezvous, a single-controller JAX program builds one
`jax.sharding.Mesh` over all devices; DP/FSDP/TP/SP become named mesh axes and
collectives are compiled into the step function by XLA over ICI/DCN.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

from m3p_tpu.config import MeshConfig

logger = logging.getLogger("m3p_tpu")

AXES = ("data", "fsdp", "seq", "tensor", "expert", "pp")


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (`jax.distributed.initialize`); no-op on one host."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def auto_init_distributed() -> bool:
    """Environment-driven multi-host bootstrap — the TPU-native analog of the
    reference's SLURM/launcher env detection (`slurm.py:60-127`).

    Detection order (first match wins):
      1. explicit JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
         JAX_PROCESS_ID env (the launcher contract)
      2. SLURM (SLURM_NTASKS > 1) or Cloud-TPU-pod metadata — both handled
         by jax.distributed.initialize()'s built-in cluster auto-detection
      3. single host: no-op

    Returns True when the distributed runtime was initialized.  Must run
    before first device use.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if addr and nproc and int(nproc) > 1:
        jax.distributed.initialize(addr, int(nproc),
                                   int(os.environ.get("JAX_PROCESS_ID", 0)))
        logger.info("distributed init: %s process %s/%s", addr,
                    os.environ.get("JAX_PROCESS_ID", 0), nproc)
        return True
    tpu_hosts = [h for h in
                 os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    if int(os.environ.get("SLURM_NTASKS", "1")) > 1 or len(tpu_hosts) > 1:
        jax.distributed.initialize()  # built-in SLURM / TPU-pod detection
        logger.info("distributed init (auto): process %d of %d",
                    jax.process_index(), jax.process_count())
        return True
    return False


def infer_mesh_shape(n_devices: int, cfg: Optional[MeshConfig] = None
                     ) -> Tuple[int, ...]:
    """Resolve (data, fsdp, seq, tensor, expert, pp) sizes; -1 absorbs the
    rest."""
    cfg = cfg or MeshConfig()
    sizes = [cfg.data, cfg.fsdp, cfg.seq, cfg.tensor, cfg.expert,
             getattr(cfg, "pp", 1)]
    fixed = 1
    free = None
    for i, s in enumerate(sizes):
        if s == -1:
            assert free is None, "only one mesh axis may be -1"
            free = i
        else:
            fixed *= s
    if free is not None:
        assert n_devices % fixed == 0, (n_devices, sizes)
        sizes[free] = n_devices // fixed
    else:
        assert fixed == n_devices, (n_devices, sizes)
    return tuple(sizes)


def make_mesh(cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = infer_mesh_shape(len(devices), cfg)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, AXES)


def default_test_mesh(n_devices: int,
                      devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """A dp x tp mesh for dry-runs: tensor=2 when divisible, else pure DP."""
    tensor = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    cfg = MeshConfig(data=-1, fsdp=1, seq=1, tensor=tensor)
    devs = list(devices if devices is not None else jax.devices())[:n_devices]
    return make_mesh(cfg, devs)
