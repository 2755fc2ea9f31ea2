"""Fused GroupNorm(+FiLM)(+SiLU) kernel tests vs flax GroupNorm composition."""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from vdiff_tpu.ops.groupnorm import gn_film_silu_pallas, gn_film_silu_reference


def _inputs(B=2, H=8, W=8, C=128, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    gamma = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1 + 1.0)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.1)
    shift = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.2)
    scale = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.2)
    return x, gamma, beta, shift, scale


def _flax_composed(x, gamma, beta, shift, scale, apply_silu=True):
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    y = gn.apply({"params": {"scale": gamma, "bias": beta}}, x)
    if scale is not None:
        y = (1.0 + scale[:, None, None, :]) * y + shift[:, None, None, :]
    if apply_silu:
        y = nn.silu(y)
    return y


def test_reference_path_matches_flax_composition():
    x, gamma, beta, shift, scale = _inputs()
    ours = gn_film_silu_reference(x, gamma, beta, shift, scale)
    expected = _flax_composed(x, gamma, beta, shift, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_reference_path_no_film_no_silu():
    x, gamma, beta, _, _ = _inputs(seed=1)
    ours = gn_film_silu_reference(x, gamma, beta, apply_silu=False)
    expected = _flax_composed(x, gamma, beta, None, None, apply_silu=False)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), rtol=1e-5, atol=1e-5)


def test_pallas_kernel_interpret_matches_reference():
    from jax.experimental.pallas import tpu as pltpu

    x, gamma, beta, shift, scale = _inputs(seed=2)
    expected = gn_film_silu_reference(x, gamma, beta, shift, scale)
    with pltpu.force_tpu_interpret_mode():
        ours = gn_film_silu_pallas(x, gamma, beta, shift, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), rtol=1e-4, atol=1e-4)


def test_pallas_kernel_interpret_no_film():
    from jax.experimental.pallas import tpu as pltpu

    x, gamma, beta, _, _ = _inputs(seed=3)
    expected = gn_film_silu_reference(x, gamma, beta)
    with pltpu.force_tpu_interpret_mode():
        ours = gn_film_silu_pallas(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(expected), rtol=1e-4, atol=1e-4)
