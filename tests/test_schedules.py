"""Golden tests for beta schedules and derived arrays.

Golden values verified by executing the reference schedule construction
(reference runners/diffusion.py:32-62,103-128; SURVEY.md §3.4).
"""

import numpy as np
import pytest

from ddim_audio_tpu.diffusion.schedules import (
    get_beta_schedule,
    make_schedule,
    make_timestep_subsequence,
)


def test_linear_schedule_golden():
    s = make_schedule("linear", 1e-4, 0.02, 1000)
    assert s.betas[0] == pytest.approx(1e-4)
    assert s.betas[-1] == pytest.approx(0.02)
    assert s.alphas_cumprod[0] == pytest.approx(0.9999)
    assert s.alphas_cumprod[-1] == pytest.approx(4.035825e-05, rel=1e-4)
    assert s.alphas_cumprod_prev[0] == 1.0
    np.testing.assert_allclose(
        s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1], rtol=0
    )


@pytest.mark.parametrize("name", ["quad", "linear", "const", "jsd", "sigmoid"])
def test_all_schedules_shape_and_range(name):
    betas = get_beta_schedule(
        name, beta_start=1e-4, beta_end=0.02, num_diffusion_timesteps=100
    )
    assert betas.shape == (100,)
    assert np.all(betas > 0)
    assert np.all(betas <= 1)


def test_jsd_schedule():
    betas = get_beta_schedule(
        "jsd", beta_start=0, beta_end=0, num_diffusion_timesteps=10
    )
    np.testing.assert_allclose(betas, 1.0 / np.linspace(10, 1, 10))


def test_alpha_with_boundary():
    s = make_schedule("linear", 1e-4, 0.02, 10)
    a = s.alpha_with_boundary()
    assert a.shape == (11,)
    assert a[0] == 1.0
    np.testing.assert_allclose(a[1:], s.alphas_cumprod)


def test_posterior_variance_matches_formula():
    s = make_schedule("linear", 1e-4, 0.02, 100)
    expected = s.betas * (1 - s.alphas_cumprod_prev) / (1 - s.alphas_cumprod)
    np.testing.assert_allclose(s.posterior_variance, expected)
    np.testing.assert_allclose(s.logvar_fixedlarge, np.log(s.betas))


def test_uniform_subsequence():
    seq = make_timestep_subsequence(1000, 100, "uniform")
    assert seq == list(range(0, 1000, 10))
    # timesteps == T → every step
    assert make_timestep_subsequence(1000, 1000, "uniform") == list(range(1000))


def test_quad_subsequence():
    seq = make_timestep_subsequence(1000, 10, "quad")
    expect = (np.linspace(0, np.sqrt(1000 * 0.8), 10) ** 2).astype(int).tolist()
    assert seq == expect
