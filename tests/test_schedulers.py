"""Scheduler unit tests: DDIM inverse identity, table parity vs an independent
numpy reproduction of the diffusers formulas, flow-matching schedule shape."""

import numpy as np
import jax.numpy as jnp
import pytest

from univst_tpu.core.scheduler import (
    DDIMConfig,
    DDIMSchedule,
    EasyInvConfig,
    FlowMatchConfig,
    FlowMatchSchedule,
    calculate_shift,
    generate_eta_values,
)


@pytest.fixture(scope="module")
def sched():
    return DDIMSchedule(DDIMConfig())


def test_timesteps_leading_spacing(sched):
    ts = sched.timesteps(50)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_alphas_cumprod_table(sched):
    # independent numpy reproduction of the scaled_linear schedule
    betas = np.linspace(0.00085**0.5, 0.012**0.5, 1000) ** 2
    ac = np.cumprod(1 - betas)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ac, rtol=1e-6)
    assert float(sched.final_alpha_cumprod) == pytest.approx(ac[0])


def test_ddim_next_step_then_step_is_identity(sched):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    for t in [1, 21, 501, 981]:
        up = sched.next_step(eps, t, x, 50)
        down = sched.step(eps, t, up, 50)
        np.testing.assert_allclose(np.asarray(down), np.asarray(x), atol=1e-4)


def test_ddim_step_matches_manual_formula(sched):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((4, 4)).astype(np.float32)
    eps = rng.standard_normal((4, 4)).astype(np.float32)
    ac = np.asarray(sched.alphas_cumprod)
    t, tp = 501, 481
    a_t, a_p = ac[t], ac[tp]
    x0 = (x - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
    expected = np.sqrt(a_p) * x0 + np.sqrt(1 - a_p) * eps
    got = np.asarray(sched.step(jnp.asarray(eps), t, jnp.asarray(x), 50))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_ddim_next_step_negative_prev_uses_final_alpha(sched):
    # first inversion step: t=1 -> t_cur = -19 -> final_alpha_cumprod
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 4)).astype(np.float32)
    eps = rng.standard_normal((4, 4)).astype(np.float32)
    ac = np.asarray(sched.alphas_cumprod)
    a_cur = ac[0]  # final_alpha_cumprod (set_alpha_to_one=False)
    a_next = ac[1]
    x0 = (x - np.sqrt(1 - a_cur) * eps) / np.sqrt(a_cur)
    expected = np.sqrt(a_next) * x0 + np.sqrt(1 - a_next) * eps
    got = np.asarray(sched.next_step(jnp.asarray(eps), 1, jnp.asarray(x), 50))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_return_to_timestep_roundtrip(sched):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((4, 4)), jnp.float32)
    t = 601
    x0 = sched.pred_original(eps, t, x)
    eps_back = sched.return_to_timestep(t, x, x0)
    np.testing.assert_allclose(np.asarray(eps_back), np.asarray(eps), atol=1e-4)


def test_easyinv_blend_gate():
    cfg = EasyInvConfig()
    gates = [bool(cfg.blend_gate(i, 50)) for i in range(50)]
    # reference window: 12.5 > i > 2.5 (ddim_inversion.py:142) -> i in 3..12
    assert [i for i, g in enumerate(gates) if g] == list(range(3, 13))


def test_flowmatch_sigmas_static_shift():
    fm = FlowMatchSchedule(FlowMatchConfig(shift=3.0))
    s = fm.sigmas(50)
    assert s.shape == (51,)
    assert s[-1] == 0.0
    assert s[0] == pytest.approx(1.0)  # shift(1.0) = 1.0
    assert np.all(np.diff(s) < 0)
    # spot-check shift formula at the second point
    raw = np.linspace(1, 1000, 50)[::-1][1] / 1000
    assert s[1] == pytest.approx(3 * raw / (1 + 2 * raw), rel=1e-6)


def test_flowmatch_dynamic_shift():
    fm = FlowMatchSchedule(FlowMatchConfig(use_dynamic_shifting=True))
    mu = calculate_shift(64 * 64)
    s = fm.sigmas(50, mu=mu)
    raw = np.linspace(1, 1000, 50)[::-1] / 1000
    expected = np.exp(mu) / (np.exp(mu) + (1 / raw - 1))
    np.testing.assert_allclose(s[:-1], expected, rtol=1e-5)


def test_euler_and_rf_solver_steps():
    x = jnp.ones((2, 2), jnp.float32)
    v = jnp.full((2, 2), 2.0, jnp.float32)
    out = FlowMatchSchedule.euler_step(v, 0.5, 0.3, x)
    np.testing.assert_allclose(np.asarray(out), 1.0 + (0.3 - 0.5) * 2.0)
    # constant velocity: midpoint solver == euler
    out2 = FlowMatchSchedule.rf_solver_step(v, v, 0.5, 0.3, x)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out))
    # quadratic trajectory x(t) = t^2 -> v = 2t: midpoint solver is exact
    sigma, sigma_next = 0.2, 0.6
    x0 = jnp.asarray([[sigma**2]], jnp.float32)
    v_c = jnp.asarray([[2 * sigma]], jnp.float32)
    mid_t = sigma + (sigma_next - sigma) / 2
    v_m = jnp.asarray([[2 * mid_t]], jnp.float32)
    out3 = FlowMatchSchedule.rf_solver_step(v_c, v_m, sigma, sigma_next, x0)
    np.testing.assert_allclose(np.asarray(out3), [[sigma_next**2]], rtol=1e-5)


def test_generate_eta_values():
    ts = np.linspace(1000, 1, 50)
    etas = generate_eta_values(ts, 25, 39, 0.85, "constant")
    assert etas.shape == (50,)
    assert np.all(etas[25:39] == np.float32(0.85))
    assert np.all(etas[:25] == 0) and np.all(etas[39:] == 0)
    inc = generate_eta_values(ts, 10, 20, 1.0, "linear_increase")
    assert inc[10] == 0.0 and inc[19] == pytest.approx(1.0)
    dec = generate_eta_values(ts, 10, 20, 1.0, "linear_decrease")
    assert dec[10] == pytest.approx(1.0) and dec[19] == 0.0
