"""Mesh sharding tests: the full AMP train step over an 8-device CPU mesh
(the same path the driver's dryrun_multichip exercises)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pulse_tpu.parallel import make_mesh, replicate, shard_env_axis, shard_train_state


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_shard_env_axis_places_shards(self):
        mesh = make_mesh()
        x = {"a": jnp.zeros((16, 4)), "b": jnp.zeros(())}
        out = shard_env_axis(mesh, x)
        assert len(out["a"].sharding.device_set) == 8

    def test_dryrun_multichip(self):
        import __graft_entry__

        __graft_entry__.dryrun_multichip(8)
