"""Experiment: batch-last vmap layout for the physics step.

vmap(in_axes=0) makes every intermediate [B, ..., 3/4/6] — the tiny trailing
dims land on the 128-wide TPU lanes and waste >90% of the bandwidth.
vmap(in_axes=-1) puts B on the lanes instead. This measures both.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt*1e3:9.2f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    from __graft_entry__ import _make_env
    from pulse_tpu.physics.step import physics_step

    env = _make_env()
    model = env.model
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state = jax.jit(env.reset)(keys)
    ph = state.physics
    pd = jax.vmap(env.action_to_pd_target)(jnp.zeros((B, env.action_dim)))

    lead = jax.jit(jax.vmap(lambda s, p: physics_step(model, s, p)))
    timeit("physics_step vmap in_axes=0 (lead)", lead, ph, pd)

    # batch-last: transpose inputs once, vmap over axis -1
    ph_t = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), ph)
    pd_t = jnp.moveaxis(pd, 0, -1)

    axes_state = jax.tree.map(lambda _: -1, ph)

    @jax.jit
    def last(ph_t, pd_t):
        return jax.vmap(
            lambda s, p: physics_step(model, s, p), in_axes=(axes_state, -1),
            out_axes=axes_state,
        )(ph_t, pd_t)

    timeit("physics_step vmap in_axes=-1 (lanes)", last, ph_t, pd_t)

    # batch-last including the transposes (realistic embedding cost)
    @jax.jit
    def last_with_transpose(ph, pd):
        ph_t = jax.tree.map(lambda x: jnp.moveaxis(x, 0, -1), ph)
        pd_t = jnp.moveaxis(pd, 0, -1)
        out = jax.vmap(
            lambda s, p: physics_step(model, s, p), in_axes=(axes_state, -1),
            out_axes=axes_state,
        )(ph_t, pd_t)
        return jax.tree.map(lambda x: jnp.moveaxis(x, -1, 0), out)

    timeit("physics_step batch-last + transposes", last_with_transpose, ph, pd)


if __name__ == "__main__":
    main()
