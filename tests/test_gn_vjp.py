"""Hand-written GN(+FiLM)(+SiLU) VJP vs autodiff of the reference forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vdiff_tpu.ops.groupnorm import _gn_film_silu_core, gn_film_silu_reference


def _inputs(B=3, H=4, W=4, C=64, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(B, H, W, C).astype(np.float32))
    gamma = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2 + 1.0)
    beta = jnp.asarray(rng.randn(C).astype(np.float32) * 0.2)
    shift = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.3)
    scale = jnp.asarray(rng.randn(B, C).astype(np.float32) * 0.3)
    return x, gamma, beta, shift, scale


@pytest.mark.parametrize("apply_silu", [True, False])
@pytest.mark.parametrize("film", [True, False])
def test_gn_vjp_matches_autodiff(apply_silu, film):
    x, gamma, beta, shift, scale = _inputs()
    if not film:
        shift = scale = None

    def loss_core(x, gamma, beta, shift, scale):
        y = _gn_film_silu_core(x, gamma, beta, shift, scale, 32, 1e-6, apply_silu)
        return jnp.sum(jnp.sin(y))  # nontrivial cotangent

    def loss_ref(x, gamma, beta, shift, scale):
        y = gn_film_silu_reference(
            x, gamma, beta, shift, scale, num_groups=32, eps=1e-6, apply_silu=apply_silu
        )
        return jnp.sum(jnp.sin(y))

    args = (x, gamma, beta, shift, scale)
    argnums = (0, 1, 2, 3, 4) if film else (0, 1, 2)
    g_core = jax.grad(loss_core, argnums=argnums)(*args)
    g_ref = jax.grad(loss_ref, argnums=argnums)(*args)
    names = ["x", "gamma", "beta", "shift", "scale"]
    for n, a, b in zip(names, g_core, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5, err_msg=f"grad {n}"
        )


def test_gn_vjp_forward_value_matches():
    x, gamma, beta, shift, scale = _inputs(seed=1)
    a = _gn_film_silu_core(x, gamma, beta, shift, scale, 32, 1e-6, True)
    b = gn_film_silu_reference(x, gamma, beta, shift, scale, num_groups=32, eps=1e-6)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_gn_vjp_bf16():
    x, gamma, beta, shift, scale = _inputs(seed=2)
    xb = x.astype(jnp.bfloat16)

    def loss(x):
        return jnp.sum(_gn_film_silu_core(x, gamma, beta, shift, scale, 32, 1e-6, True).astype(jnp.float32))

    g = jax.grad(loss)(xb)
    assert g.dtype == jnp.bfloat16 and np.all(np.isfinite(np.asarray(g, np.float32)))


def test_gn_vjp_bf16_close_to_f32():
    """The bf16 path stores xhat/dz at 2 bytes; its gradients must stay within
    bf16 rounding of the f32 backward (the cotangent itself is bf16 under
    mixed precision, so no information is lost beyond that rounding)."""
    x, gamma, beta, shift, scale = _inputs(seed=3)
    xb = x.astype(jnp.bfloat16)

    def loss(fn_x, x):
        y = _gn_film_silu_core(x, gamma, beta, shift, scale, 32, 1e-6, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    g16 = np.asarray(jax.grad(lambda a: loss(None, a))(xb), np.float32)
    g32 = np.asarray(jax.grad(lambda a: loss(None, a))(x), np.float32)
    denom = np.abs(g32).max()
    assert np.abs(g16 - g32).max() / denom < 0.05, np.abs(g16 - g32).max() / denom