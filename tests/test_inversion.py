"""Inversion scan tests: round-trip identity, EasyInv gating, trajectory
layout, feature capture — the reconstruction oracle from SURVEY.md §4."""

import jax
import jax.numpy as jnp
import numpy as np

from univst_tpu.core.scheduler import (
    DDIMSchedule,
    EasyInvConfig,
    FlowMatchConfig,
    FlowMatchSchedule,
    generate_eta_values,
)
from univst_tpu.methods.inversion import (
    ddim_invert,
    ddim_sample,
    rf_invert,
    rf_sample_controlled,
    rf_solver_invert,
)

N = 10


def _const_eps_denoiser(c):
    def denoise(latent, t, i):
        return jnp.full_like(latent, c), None

    return denoise


def test_ddim_invert_then_sample_roundtrip():
    """With a latent-independent epsilon model, inversion and sampling are
    exact inverses through the whole scan."""
    sched = DDIMSchedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4), jnp.float32)
    denoise = _const_eps_denoiser(0.3)
    traj, _ = jax.jit(lambda x: ddim_invert(denoise, x, sched, N))(x0)
    assert traj.shape == (N + 1,) + x0.shape
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x0))
    back = jax.jit(lambda xT: ddim_sample(denoise, xT, sched, N))(traj[-1])
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=1e-3)


def test_ddim_invert_matches_python_loop():
    sched = DDIMSchedule()
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 2), jnp.float32)

    def denoise(latent, t, i):
        return latent * 0.1, None  # latent-dependent eps

    traj, _ = ddim_invert(denoise, x0, sched, N)
    # python reference loop (same order as ddim_loop, ddim_inversion.py:101-113)
    ts = sched.timesteps(N)[::-1]
    lat = x0
    expected = [x0]
    for i in range(N):
        eps = lat * 0.1
        lat = sched.next_step(eps, int(ts[i]), lat, N)
        expected.append(lat)
    np.testing.assert_allclose(
        np.asarray(traj), np.asarray(jnp.stack(expected)), rtol=1e-5, atol=1e-6
    )


def test_easyinv_changes_trajectory_only_in_window():
    sched = DDIMSchedule()
    x0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 2), jnp.float32)

    def denoise(latent, t, i):
        return latent * 0.05, None

    plain, _ = ddim_invert(denoise, x0, sched, 50)
    easy, _ = ddim_invert(denoise, x0, sched, 50, easyinv=EasyInvConfig())
    plain, easy = np.asarray(plain), np.asarray(easy)
    # identical before the first blend step (gate opens at i=3 -> index 4 diff)
    np.testing.assert_allclose(easy[:4], plain[:4], atol=0)
    assert np.abs(easy[4] - plain[4]).max() > 0


def test_feature_capture_at_timestep():
    sched = DDIMSchedule()
    x0 = jnp.ones((1, 4, 4, 2), jnp.float32)
    ts = sched.timesteps(N)
    target_t = int(ts[::-1][3])  # timestep of inversion step 3

    def denoise(latent, t, i):
        # feature = the timestep broadcast, so we can verify which step landed
        return latent * 0.0, jnp.full((2, 2), t, jnp.float32)

    _, captured = ddim_invert(denoise, x0, sched, N, capture_timestep=target_t)
    np.testing.assert_allclose(np.asarray(captured), target_t)


def test_rf_invert_sample_roundtrip():
    fm = FlowMatchSchedule(FlowMatchConfig(shift=3.0))
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 8, 8, 4), jnp.float32)

    def denoise(latent, t, i):
        return jnp.full_like(latent, 0.5), None

    traj, _ = rf_invert(denoise, x0, fm, N, gamma=0.0)
    assert traj.shape == (N + 1,) + x0.shape
    etas = generate_eta_values(fm.timesteps(N), 2, 5, 0.0)  # eta=0 -> pure model
    back = rf_sample_controlled(denoise, traj[-1], x0, fm, N, etas)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x0), atol=1e-3)


def test_rf_solver_more_accurate_than_euler():
    """Velocity linear in sigma: midpoint integrates exactly, Euler doesn't."""
    fm = FlowMatchSchedule(FlowMatchConfig(shift=1.0))
    x0 = jnp.zeros((1, 2, 2, 1), jnp.float32)

    def denoise(latent, t, i):
        sigma = t / 1000.0
        return jnp.full_like(latent, 2.0) * sigma, None

    # exact: dx/ds = 2 s -> x(s) = s^2
    traj_euler, _ = rf_invert(denoise, x0, fm, 25)
    traj_mid, _ = rf_solver_invert(denoise, x0, fm, 25)
    s_max = fm.sigmas(25)[0]
    exact = s_max**2
    err_euler = abs(float(traj_euler[-1].ravel()[0]) - exact)
    err_mid = abs(float(traj_mid[-1].ravel()[0]) - exact)
    assert err_mid < err_euler / 10


def test_easyinv_fixed_point_iterations():
    """num_fix_itr > 0 runs extra denoiser evaluations at the target point
    (reference scaffold, ddim_inversion.py:146-154; shipped with 0 iters)."""
    from univst_tpu.core.scheduler import EasyInvConfig

    sched = DDIMSchedule()
    x0 = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 2), jnp.float32)
    calls = []

    def denoise(latent, t, i):
        calls.append(1)
        return latent * 0.05, None

    base, _ = ddim_invert(denoise, x0, sched, N, easyinv=EasyInvConfig(num_fix_itr=0))
    fixed, _ = ddim_invert(denoise, x0, sched, N, easyinv=EasyInvConfig(num_fix_itr=2))
    # latent-dependent eps -> refinement changes the trajectory
    assert np.abs(np.asarray(fixed[-1]) - np.asarray(base[-1])).max() > 0
