"""Domain randomization ≙ BaseTask.apply_randomizations
(/root/reference/phc/env/tasks/base_task.py:518-697).

The reference's DR harness has two halves:

  1. "observations"/"actions" noise lambdas (base_task.py:548-617): built
     from a distribution (gaussian | uniform), an operation (additive |
     scaling), a schedule on the noise magnitude (linear | constant | None,
     base_task.py:556-563), and an optional *correlated* component — a
     standard-normal draw made once per randomization event and held fixed
     between events (base_task.py:582-589,608-615). Applied to actions
     pre-physics (base_task.py:217-218) and to the obs buffer post-physics
     (base_task.py:233-234). Refresh cadence is global: every `frequency`
     sim frames (base_task.py:520-541 do_nonenv_randomize).

  2. Per-env physical actor properties (friction/mass/scale/dof gains,
     base_task.py:643-686), re-sampled for envs whose randomize_buf
     exceeded `frequency` at reset time.

TPU-native redesign: half (1) is a pure function of (spec, step, held
correlated draw, fresh key) traced into the jitted env step; the correlated
draw lives in EnvState and is refreshed by an in-graph where-select every
`frequency` policy steps. Half (2) reuses the batched-model machinery
(physics/shape_variation.py): model array leaves carry a leading env axis,
so per-env friction/mass/PD-gain multipliers are one host-side resample
(`randomize_model_props`) at build/epoch granularity — the same cadence the
reference reaches in practice through its reset-gated path.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from pulse_tpu.physics.model import Model


@dataclass(frozen=True)
class DRSpec:
    """One noise entry (≙ the dr_params["observations"/"actions"] dicts,
    e.g. the isaacgym-style randomization_params YAML schema)."""

    distribution: str = "gaussian"          # gaussian | uniform
    operation: str = "additive"             # additive | scaling
    # gaussian: (mu, var) — "var" is the reference's name for the std
    # multiplier (base_task.py:585-590 uses it as randn * var). uniform:
    # (lo, hi).
    range: tuple[float, float] = (0.0, 0.02)
    range_correlated: tuple[float, float] = (0.0, 0.0)
    schedule: str | None = None             # linear | constant | None
    schedule_steps: int = 1

    def __post_init__(self):
        if self.distribution not in ("gaussian", "uniform"):
            raise ValueError(f"unknown distribution {self.distribution!r}")
        if self.operation not in ("additive", "scaling"):
            raise ValueError(f"unknown operation {self.operation!r}")
        if self.schedule not in (None, "linear", "constant"):
            raise ValueError(f"unknown schedule {self.schedule!r}")


@dataclass(frozen=True)
class DRConfig:
    """≙ task.randomization_params. `frequency` counts policy steps (the
    reference counts sim frames via gym.get_frame_count; ours tick together
    since every env advances in lockstep)."""

    observations: DRSpec | None = None
    actions: DRSpec | None = None
    frequency: int = 1
    # physical actor-property multipliers (≙ actor_params rigid_shape/
    # rigid_body/dof_properties entries, base_task.py:643-686), applied by
    # randomize_model_props. None disables an axis.
    friction_range: tuple[float, float] | None = None
    mass_range: tuple[float, float] | None = None
    gain_range: tuple[float, float] | None = None


def schedule_scaling(spec: DRSpec, step: jax.Array) -> jax.Array:
    """sched_scaling ≙ base_task.py:556-563: linear ramps 0→1 over
    schedule_steps; constant is a 0/1 gate at schedule_steps; no schedule
    means full scale from the first step."""
    step = step.astype(jnp.float32)
    if spec.schedule == "linear":
        n = float(max(spec.schedule_steps, 1))
        return jnp.minimum(step, n) / n
    if spec.schedule == "constant":
        return jnp.where(step < float(spec.schedule_steps), 0.0, 1.0)
    return jnp.ones(())


def _scheduled_params(spec: DRSpec, step: jax.Array):
    """The four scheduled noise parameters. Additive ops scale all four by
    sched_scaling (base_task.py:568-572,594-599); scaling ops ramp the
    variance and lerp the mean/bounds toward the identity value 1
    (base_task.py:573-580,600-605)."""
    a, b = spec.range
    ac, bc = spec.range_correlated
    s = schedule_scaling(spec, step)
    if spec.distribution == "gaussian":
        mu, var, mu_c, var_c = a, b, ac, bc
        if spec.operation == "additive":
            return mu * s, var * s, mu_c * s, var_c * s
        return mu * s + (1.0 - s), var * s, mu_c * s + (1.0 - s), var_c * s
    lo, hi, lo_c, hi_c = a, b, ac, bc
    if spec.operation == "additive":
        return lo * s, hi * s, lo_c * s, hi_c * s
    return (
        lo * s + (1.0 - s),
        hi * s + (1.0 - s),
        lo_c * s + (1.0 - s),
        hi_c * s + (1.0 - s),
    )


def apply_noise(
    spec: DRSpec,
    tensor: jax.Array,
    corr_raw: jax.Array,
    key: jax.Array,
    step: jax.Array,
) -> jax.Array:
    """noise_lambda ≙ base_task.py:582-590 (gaussian) / :608-616 (uniform).
    `corr_raw` is the standard-normal draw held between randomization
    events (the reference stores it as params['corr']); the uncorrelated
    component is redrawn every call from `key`. `step` drives the schedule
    (≙ self.last_step)."""
    p0, p1, p0_c, p1_c = _scheduled_params(spec, step)
    if spec.distribution == "gaussian":
        corr = corr_raw * p1_c + p0_c
        noise = corr + jax.random.normal(key, tensor.shape) * p1 + p0
    else:
        corr = corr_raw * (p1_c - p0_c) + p0_c
        noise = (
            corr
            + jax.random.uniform(key, tensor.shape) * (p1 - p0)
            + p0
        )
    if spec.operation == "additive":
        return tensor + noise
    return tensor * noise


def randomize_model_props(
    model: Model,
    key: jax.Array,
    num_envs: int,
    friction_range: tuple[float, float] | None = None,
    mass_range: tuple[float, float] | None = None,
    gain_range: tuple[float, float] | None = None,
) -> Model:
    """Per-env physical-property randomization (≙ the actor_params half of
    apply_randomizations, base_task.py:643-686: rigid_shape friction,
    rigid_body mass, dof_properties stiffness/damping — uniform scaling
    multipliers per env). Returns a batched Model; composes with
    vary_model_scales / models_from_betas (already-batched leaves are
    multiplied in place)."""
    from pulse_tpu.physics.shape_variation import vary_model_scales

    if model.cp_body.ndim == 1:
        model = vary_model_scales(model, jax.random.PRNGKey(0), num_envs, (1.0, 1.0))
    k_fric, k_mass, k_gain = jax.random.split(key, 3)
    updates = {}
    if friction_range is not None:
        mult = jax.random.uniform(
            k_fric, (num_envs, 1), minval=friction_range[0], maxval=friction_range[1]
        )
        updates["cp_friction"] = model.cp_friction * mult
    if mass_range is not None:
        mult = jax.random.uniform(
            k_mass, (num_envs, 1), minval=mass_range[0], maxval=mass_range[1]
        )
        updates["body_mass"] = model.body_mass * mult
        updates["total_mass"] = jnp.sum(updates["body_mass"], axis=-1)
        updates["spatial_inertia"] = (
            model.spatial_inertia * mult[..., None, None]
        )
    if gain_range is not None:
        mult = jax.random.uniform(
            k_gain, (num_envs, 1), minval=gain_range[0], maxval=gain_range[1]
        )
        updates["joint_kp"] = model.joint_kp * mult
        updates["joint_kd"] = model.joint_kd * mult
    return model.replace(**updates) if updates else model


def dr_config_from_dict(d: dict) -> DRConfig:
    """Build DRConfig from a randomization_params-style mapping (the env
    YAML schema, mirroring isaacgym's: frequency + observations/actions
    blocks with range/range_correlated/operation/distribution/schedule)."""

    def spec(block) -> DRSpec | None:
        if not block:
            return None
        return DRSpec(
            distribution=str(block.get("distribution", "gaussian")),
            operation=str(block.get("operation", "additive")),
            range=tuple(float(x) for x in block.get("range", (0.0, 0.02))),
            range_correlated=tuple(
                float(x) for x in block.get("range_correlated", (0.0, 0.0))
            ),
            schedule=block.get("schedule"),
            schedule_steps=int(block.get("schedule_steps", 1)),
        )

    def rng(name) -> tuple[float, float] | None:
        v = d.get(name)
        return None if v is None else tuple(float(x) for x in v)

    return DRConfig(
        observations=spec(d.get("observations")),
        actions=spec(d.get("actions")),
        frequency=int(d.get("frequency", 1)),
        friction_range=rng("friction_range"),
        mass_range=rng("mass_range"),
        gain_range=rng("gain_range"),
    )
