"""Diffusion beta schedules, respacing, and precomputed tables.

TPU-native re-design of the reference's ADM/IDDPM-lineage numerics
(reference: models/diffusion/gaussian_diffusion.py:59-202,
models/diffusion/respace.py:12-115, models/diffusion/__init__.py:10-52).

All tables are computed once in float64 numpy and frozen into a pytree of
float32 ``jnp`` arrays so the sampling loop is a pure ``lax.scan`` over a
static-length index list — no Python control flow under ``jit``.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np
from flax import struct


def get_named_beta_schedule(schedule_name: str, num_diffusion_timesteps: int) -> np.ndarray:
    """Named beta schedules (reference gaussian_diffusion.py:99-142)."""
    if schedule_name == "linear":
        scale = 1000 / num_diffusion_timesteps
        return np.linspace(
            scale * 0.0001, scale * 0.02, num_diffusion_timesteps, dtype=np.float64
        )
    if schedule_name == "squaredcos_cap_v2":
        return betas_for_alpha_bar(
            num_diffusion_timesteps,
            lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2,
        )
    raise NotImplementedError(f"unknown beta schedule: {schedule_name}")


def betas_for_alpha_bar(num_diffusion_timesteps, alpha_bar, max_beta=0.999) -> np.ndarray:
    betas = []
    for i in range(num_diffusion_timesteps):
        t1 = i / num_diffusion_timesteps
        t2 = (i + 1) / num_diffusion_timesteps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def space_timesteps(num_timesteps: int, section_counts) -> set[int]:
    """Subset of original timesteps to retain (reference respace.py:12-62)."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {desired_count} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


class DiffusionTables(NamedTuple):
    """Precomputed per-timestep constants over the (possibly respaced) chain.

    A NamedTuple of jnp arrays => a JAX pytree; safe to close over or pass
    through ``jit``/``scan`` boundaries.
    """

    betas: jnp.ndarray
    log_betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    alphas_cumprod_next: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    # FIXED_LARGE variance tables (gaussian_diffusion.py:298-301)
    fixed_large_variance: jnp.ndarray
    fixed_large_log_variance: jnp.ndarray
    # maps spaced index -> original timestep fed to the network
    # (respace.py:117-129)
    timestep_map: jnp.ndarray

    @property
    def num_timesteps(self) -> int:
        return int(self.betas.shape[0])


def build_tables(
    betas: np.ndarray,
    use_timesteps: Sequence[int] | None = None,
    dtype=jnp.float32,
) -> DiffusionTables:
    """Build all sampling tables; optionally respace onto ``use_timesteps``.

    Respacing recomputes betas on the retained subset exactly like
    SpacedDiffusion (respace.py:73-87).
    """
    betas = np.asarray(betas, dtype=np.float64)
    assert betas.ndim == 1 and (betas > 0).all() and (betas <= 1).all()
    num_original = len(betas)

    alphas_cumprod_full = np.cumprod(1.0 - betas, axis=0)
    if use_timesteps is not None:
        use = set(int(t) for t in use_timesteps)
        timestep_map = []
        new_betas = []
        last_ac = 1.0
        for i, ac in enumerate(alphas_cumprod_full):
            if i in use:
                new_betas.append(1 - ac / last_ac)
                last_ac = ac
                timestep_map.append(i)
        betas = np.array(new_betas, dtype=np.float64)
    else:
        timestep_map = list(range(num_original))

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    alphas_cumprod_next = np.append(alphas_cumprod[1:], 0.0)

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    if len(posterior_variance) > 1:
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
        fixed_large_variance = np.append(posterior_variance[1], betas[1:])
    else:  # single-step chain (the reference leaves these empty/invalid)
        posterior_log_variance_clipped = np.log(np.maximum(betas, 1e-20))
        fixed_large_variance = betas.copy()

    def j(x):
        return jnp.asarray(np.asarray(x), dtype=dtype)

    return DiffusionTables(
        betas=j(betas),
        log_betas=j(np.log(betas)),
        alphas_cumprod=j(alphas_cumprod),
        alphas_cumprod_prev=j(alphas_cumprod_prev),
        alphas_cumprod_next=j(alphas_cumprod_next),
        sqrt_alphas_cumprod=j(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=j(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=j(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=j(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=j(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=j(posterior_variance),
        posterior_log_variance_clipped=j(posterior_log_variance_clipped),
        posterior_mean_coef1=j(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=j(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        fixed_large_variance=j(fixed_large_variance),
        fixed_large_log_variance=j(np.log(fixed_large_variance)),
        timestep_map=jnp.asarray(np.array(timestep_map), dtype=jnp.int32),
    )


@struct.dataclass
class Diffusion:
    """Tables (pytree leaves) + static configuration (pytree metadata, so
    a Diffusion can be passed straight through ``jax.jit``)."""

    tables: DiffusionTables
    mean_type: str = struct.field(pytree_node=False)   # 'eps'|'xstart'|'v'
    var_type: str = struct.field(pytree_node=False)    # 'learned_range'|...
    loss_type: str = struct.field(pytree_node=False)   # 'mse'|'rescaled_mse'|...

    @property
    def num_timesteps(self) -> int:
        return self.tables.num_timesteps

    @property
    def learn_sigma(self) -> bool:
        return self.var_type in ("learned", "learned_range")


def create_diffusion(
    timestep_respacing=None,
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    parameterization: str = "eps",
    learn_sigma: bool = True,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
) -> Diffusion:
    """Factory mirroring the reference (models/diffusion/__init__.py:10-52)."""
    betas = get_named_beta_schedule(noise_schedule, diffusion_steps)
    if use_kl:
        loss_type = "rescaled_kl"
    elif rescale_learned_sigmas:
        loss_type = "rescaled_mse"
    else:
        loss_type = "mse"
    if timestep_respacing is None or timestep_respacing == "":
        timestep_respacing = [diffusion_steps]
    mean_type = {"eps": "eps", "xstart": "xstart", "v": "v"}.get(parameterization)
    if mean_type is None:
        raise NotImplementedError(f"parameterization {parameterization} not supported")
    var_type = (
        "learned_range"
        if learn_sigma
        else ("fixed_small" if sigma_small else "fixed_large")
    )
    tables = build_tables(
        betas, use_timesteps=sorted(space_timesteps(diffusion_steps, timestep_respacing))
    )
    return Diffusion(tables=tables, mean_type=mean_type, var_type=var_type, loss_type=loss_type)
