"""Device-mesh sharding for training at scale.

The reference's only multi-device path is Horovod data parallelism
(run_hydra.py:117-131, common_agent.py:455-470: per-rank envs + NCCL grad
all-reduce). The TPU-native equivalent is declarative: place env states and
rollout data with the env axis sharded over the mesh's `data` axis, replicate
params, and let XLA insert the psum for gradients over ICI. One program, SPMD,
no communication code.

  mesh = make_mesh()                          # all local devices on "data"
  ts = shard_train_state(mesh, ts)            # envs sharded, params replicated
  train = jax.jit(agent.train_epoch, ...)     # XLA handles the rest

Because every per-env computation is independent until the gradient
reduction, this scales env throughput linearly in chips; minibatch gradient
all-reduces ride ICI.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_env_axis(mesh: Mesh, tree, axis_name: str = "data"):
    """Place every array with its leading (env/batch) axis sharded."""
    def place(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, NamedSharding(mesh, P(axis_name)))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return jax.tree.map(place, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )


def shard_train_state(mesh: Mesh, ts, axis_name: str = "data"):
    """Shard a PPO/AMP/Distill/Joint TrainState: env states over the mesh,
    everything else (params, optimizer, normalizers, buffers) replicated."""
    if hasattr(ts, "amp") and hasattr(ts, "distill"):  # JointTrainState
        return ts.replace(
            amp=shard_train_state(mesh, ts.amp, axis_name),
            distill=shard_train_state(mesh, ts.distill, axis_name),
        )
    if hasattr(ts, "ppo"):  # AMPTrainState
        return ts.replace(
            ppo=shard_train_state(mesh, ts.ppo, axis_name),
            amp=replicate(mesh, ts.amp),
        )
    sharded_env = shard_env_axis(mesh, ts.env_state, axis_name)
    rest = replicate(mesh, ts.replace(env_state=None))
    return rest.replace(env_state=sharded_env)
