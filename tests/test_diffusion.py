import jax
import jax.numpy as jnp
import numpy as np
import pytest

from topiaxl.diffusion import create_diffusion, gaussian, space_timesteps
from topiaxl.diffusion.schedule import build_tables, get_named_beta_schedule


def test_beta_schedules():
    for name in ["linear", "squaredcos_cap_v2"]:
        betas = get_named_beta_schedule(name, 1000)
        assert betas.shape == (1000,)
        assert (betas > 0).all() and (betas <= 0.999).all()
    # squaredcos is monotonically increasing for this cap
    b = get_named_beta_schedule("squaredcos_cap_v2", 1000)
    assert (np.diff(b) >= -1e-12).all()


def test_space_timesteps_ddim():
    s = space_timesteps(1000, "ddim25")
    assert len(s) == 25
    assert s == set(range(0, 1000, 40))
    s = space_timesteps(1000, [1000])
    assert len(s) == 1000


def test_respaced_tables_match_subset():
    betas = get_named_beta_schedule("squaredcos_cap_v2", 100)
    full = build_tables(betas)
    use = sorted(space_timesteps(100, "ddim10"))
    spaced = build_tables(betas, use_timesteps=use)
    # alphas_cumprod of the spaced chain equals the full chain at kept steps
    np.testing.assert_allclose(
        np.asarray(spaced.alphas_cumprod),
        np.asarray(full.alphas_cumprod)[use],
        rtol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(spaced.timestep_map), use)


def test_v_param_roundtrip():
    diff = create_diffusion(
        timestep_respacing=None,
        noise_schedule="squaredcos_cap_v2",
        parameterization="v",
        diffusion_steps=100,
    )
    tab = diff.tables
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (4, 8, 6))
    noise = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 6))
    t = jnp.array([0, 3, 50, 99])
    x_t = gaussian.q_sample(tab, x0, t, noise)
    v = gaussian.get_v(tab, x0, noise, t)
    x0_rec = gaussian.predict_xstart_from_v(tab, x_t, t, v)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)
    # eps round trip as well
    x0_rec2 = gaussian.predict_xstart_from_eps(tab, x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec2), np.asarray(x0), atol=1e-3)
    eps_rec = gaussian.predict_eps_from_xstart(tab, x_t, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-3)


def _perfect_v_model(diff, x0):
    """A model that outputs the exact velocity for known x0 (+ zero variance
    logits in the learned-range half)."""
    tab = diff.tables

    def model_fn(x, t_orig):
        # invert the timestep map: here chains are built so that
        # timestep_map[t] == t_orig; find spaced t by searchsorted
        t = jnp.searchsorted(tab.timestep_map, t_orig)
        nd = x.ndim
        sa = tab.sqrt_alphas_cumprod[t].reshape((-1,) + (1,) * (nd - 1))
        so = tab.sqrt_one_minus_alphas_cumprod[t].reshape((-1,) + (1,) * (nd - 1))
        # x_t = sa x0 + so eps => eps = (x - sa x0)/so; v = sa eps - so x0
        eps = (x - sa * x0) / so
        v = sa * eps - so * x0
        return jnp.concatenate([v, jnp.zeros_like(v)], axis=-1)

    return model_fn


def test_ddim_loop_recovers_x0_with_perfect_model():
    diff = create_diffusion(
        timestep_respacing="ddim25",
        noise_schedule="squaredcos_cap_v2",
        parameterization="v",
        diffusion_steps=1000,
    )
    assert diff.num_timesteps == 25
    key = jax.random.PRNGKey(42)
    x0 = 0.5 * jax.random.normal(key, (2, 16, 4))
    noise = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 4))
    model_fn = _perfect_v_model(diff, x0)
    out = gaussian.ddim_sample_loop(diff, model_fn, noise, jax.random.PRNGKey(0))
    # with a perfect model, DDIM (eta=0) reconstructs x0 exactly at t=0
    np.testing.assert_allclose(np.asarray(out.sample), np.asarray(x0), atol=2e-3)


def test_ddim_deterministic_and_trajectory():
    diff = create_diffusion(
        timestep_respacing="ddim10",
        noise_schedule="squaredcos_cap_v2",
        parameterization="v",
        diffusion_steps=1000,
    )

    def model_fn(x, t_orig):
        return jnp.concatenate([0.1 * x, jnp.zeros_like(x)], axis=-1)

    noise = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 4))
    o1 = gaussian.ddim_sample_loop(diff, model_fn, noise, jax.random.PRNGKey(0))
    o2 = gaussian.ddim_sample_loop(
        diff, model_fn, noise, jax.random.PRNGKey(999), keep_trajectory=True
    )
    # eta=0 => key must not matter
    np.testing.assert_allclose(np.asarray(o1.sample), np.asarray(o2.sample), atol=1e-6)
    assert o2.trajectory.shape == (10, 1, 8, 4)
    np.testing.assert_allclose(
        np.asarray(o2.trajectory[-1]), np.asarray(o2.sample), atol=1e-6
    )


def test_p_sample_loop_runs():
    diff = create_diffusion(
        timestep_respacing="ddim5",
        noise_schedule="linear",
        parameterization="eps",
        diffusion_steps=50,
    )

    def model_fn(x, t_orig):
        return jnp.concatenate([jnp.zeros_like(x), jnp.zeros_like(x)], axis=-1)

    noise = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4))
    out = gaussian.p_sample_loop(diff, model_fn, noise, jax.random.PRNGKey(0))
    assert out.sample.shape == noise.shape
    assert np.isfinite(np.asarray(out.sample)).all()


def test_training_losses_v_param():
    diff = create_diffusion(
        timestep_respacing=None,
        noise_schedule="squaredcos_cap_v2",
        parameterization="v",
        diffusion_steps=100,
    )
    x0 = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 6))
    t = jnp.array([0, 10, 50, 99])

    # perfect model => zero MSE
    tab = diff.tables
    noise = jax.random.normal(jax.random.PRNGKey(5), x0.shape)

    def model_fn(x, t_orig):
        v = gaussian.get_v(tab, x0, noise, t)
        return jnp.concatenate([v, jnp.zeros_like(v)], axis=-1)

    terms = gaussian.training_losses(
        diff, model_fn, x0, t, jax.random.PRNGKey(5), noise=noise
    )
    np.testing.assert_allclose(np.asarray(terms["loss_mse"]), 0.0, atol=1e-10)
    assert terms["loss_vb"].shape == (4,)
    assert np.isfinite(np.asarray(terms["loss_total"])).all()


def test_normal_kl_zero_for_identical():
    kl = gaussian.normal_kl(1.0, 0.5, 1.0, 0.5)
    assert abs(float(kl)) < 1e-6


def test_dpm_solver_recovers_x0_with_perfect_model():
    """DPM-Solver++(2M) with a perfect model converges to x0 — and does
    so with HALF the steps DDIM uses."""
    diff = create_diffusion(
        timestep_respacing="ddim12",
        noise_schedule="squaredcos_cap_v2",
        parameterization="v",
        diffusion_steps=1000,
    )
    key = jax.random.PRNGKey(42)
    x0 = 0.5 * jax.random.normal(key, (2, 16, 4))
    noise = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 4))
    model_fn = _perfect_v_model(diff, x0)
    out = gaussian.dpm_solver_pp_2m_loop(diff, model_fn, noise,
                                         jax.random.PRNGKey(0))
    assert bool(jnp.all(jnp.isfinite(out.sample)))
    np.testing.assert_allclose(np.asarray(out.sample), np.asarray(x0),
                               atol=2e-3)


def test_dpm_solver_half_steps_tracks_ddim_on_rough_model():
    """On an IMPERFECT model (perfect x0 + structured bias), 12-step
    DPM-Solver++ lands within the same neighborhood as 25-step DDIM —
    the second-order multistep correction is doing its job."""
    key = jax.random.PRNGKey(3)
    x0 = 0.5 * jax.random.normal(key, (2, 16, 4))
    bias = 0.05 * jax.random.normal(jax.random.PRNGKey(11), (2, 16, 4))

    def rough(diff):
        perfect = _perfect_v_model(diff, x0)

        def model_fn(x, t):
            return perfect(x, t) + jnp.concatenate([bias, jnp.zeros_like(bias)],
                                                   axis=-1)
        return model_fn

    noise = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 4))
    d25 = create_diffusion(timestep_respacing="ddim25",
                           noise_schedule="squaredcos_cap_v2",
                           parameterization="v", diffusion_steps=1000)
    d12 = create_diffusion(timestep_respacing="ddim12",
                           noise_schedule="squaredcos_cap_v2",
                           parameterization="v", diffusion_steps=1000)
    ref = gaussian.ddim_sample_loop(d25, rough(d25), noise,
                                    jax.random.PRNGKey(0)).sample
    dpm = gaussian.dpm_solver_pp_2m_loop(d12, rough(d12), noise,
                                         jax.random.PRNGKey(0)).sample
    # both converge near x0 + O(bias); they must agree with each other
    # about as well as either agrees with x0
    d_ref = float(jnp.sqrt(jnp.mean((ref - x0) ** 2)))
    d_dpm = float(jnp.sqrt(jnp.mean((dpm - x0) ** 2)))
    d_cross = float(jnp.sqrt(jnp.mean((dpm - ref) ** 2)))
    assert d_dpm < 2.0 * max(d_ref, 0.02), (d_ref, d_dpm)
    assert d_cross < 2.0 * max(d_ref, 0.02), (d_ref, d_dpm, d_cross)
