"""Component micro-benchmarks on the attached accelerator.

Times the pieces of the env step separately so optimization effort goes to
the real bottleneck. Usage: python tools/microbench.py [num_envs]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt*1e3:9.2f} ms")
    return dt


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096

    from __graft_entry__ import _make_env
    from pulse_tpu.physics.step import physics_step, _substep
    from pulse_tpu.physics.state import refresh_kinematics
    from pulse_tpu.physics.contact import plane_contact_forces
    from pulse_tpu.physics.aba_fast import aba_fast
    from pulse_tpu.physics.dynamics import spd_joint_torques
    from pulse_tpu.motion.motion_lib import get_motion_state

    env = _make_env()
    model = env.model
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    state = jax.jit(env.reset)(keys)
    actions = jnp.zeros((B, env.action_dim))
    pd = jax.vmap(env.action_to_pd_target)(actions)

    print(f"== micro-bench at {B} envs on {jax.devices()[0].platform} ==")

    full = jax.jit(env.step)
    t_full = timeit("env.step (4 substeps + obs)", full, state, actions)

    ph = state.physics
    pstep = jax.jit(jax.vmap(lambda s, p: physics_step(model, s, p)))
    t_phys = timeit("physics_step (4 substeps)", pstep, ph, pd)

    sub = jax.jit(jax.vmap(lambda s, p: _substep(model, s, p, model.config.h)))
    t_sub = timeit("one substep", sub, ph, pd)

    refresh = jax.jit(jax.vmap(lambda s: refresh_kinematics(model, s)))
    t_ref = timeit("refresh_kinematics", refresh, ph)

    contact = jax.jit(
        jax.vmap(
            lambda s: plane_contact_forces(
                model, s.body_pos, s.body_rot, s.body_vel, s.body_ang_vel
            )
        )
    )
    t_con = timeit("plane_contact_forces", contact, ph)

    tau_fn = jax.jit(
        jax.vmap(lambda s, p: spd_joint_torques(model, s, p, model.config.h))
    )
    t_tau = timeit("spd_joint_torques", tau_fn, ph, pd)

    tau, d_extra = tau_fn(ph, pd)
    f_ext = jnp.zeros((B, model.num_bodies, 6))
    aba_fn = jax.jit(
        jax.vmap(
            lambda s, t, f, d: aba_fast(model, s, t, f, s.body_rot, model.config.h, d)
        )
    )
    t_aba = timeit("aba_fast", aba_fn, ph, tau, f_ext, d_extra)

    ids = state.motion_id
    times = state.start_time
    mstate = jax.jit(lambda i, t: get_motion_state(env.motion, i, t))
    t_mot = timeit("motion get_motion_state", mstate, ids, times)

    obs_fn = jax.jit(jax.vmap(env._observe))
    t_obs = timeit("observe (self+task obs)", obs_fn, state)

    print(
        f"\nbreakdown: substep ~= refresh {t_ref*1e3:.2f} + contact {t_con*1e3:.2f}"
        f" + tau {t_tau*1e3:.2f} + aba {t_aba*1e3:.2f} (sum {1e3*(t_ref+t_con+t_tau+t_aba):.2f},"
        f" measured {t_sub*1e3:.2f})"
    )
    print(f"env.step = physics {t_phys*1e3:.2f} + rest {1e3*(t_full-t_phys):.2f}")


if __name__ == "__main__":
    main()
