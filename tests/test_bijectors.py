import jax
import jax.numpy as jnp
import numpy as np

from spmf_tpu import bijectors as tfb


def _check_roundtrip_and_jac(b, x):
    y = b.forward(x)
    np.testing.assert_allclose(b.inverse(y), x, rtol=1e-9, atol=1e-12)
    # fldj vs autodiff
    jac = jax.vmap(jax.grad(lambda t: b.forward(t)))(x)
    np.testing.assert_allclose(
        b.forward_log_det_jacobian(x), jnp.log(jnp.abs(jac)), rtol=1e-7, atol=1e-12
    )
    np.testing.assert_allclose(
        b.inverse_log_det_jacobian(y), -jnp.log(jnp.abs(jac)), rtol=1e-7, atol=1e-12
    )


def test_softplus():
    _check_roundtrip_and_jac(tfb.Softplus(), jnp.array([-6.0, -1.0, 0.0, 2.0, 20.0]))


def test_identity():
    b = tfb.Identity()
    x = jnp.array([-1.0, 3.0])
    np.testing.assert_allclose(b.forward(x), x)
    np.testing.assert_allclose(b.forward_log_det_jacobian(x), 0.0)


def test_exp():
    _check_roundtrip_and_jac(tfb.Exp(), jnp.array([-3.0, 0.0, 2.0]))


def test_chain():
    b = tfb.Chain([tfb.Softplus(), tfb.Exp()])  # softplus(exp(x))
    x = jnp.array([-1.0, 0.5])
    np.testing.assert_allclose(b.forward(x), jax.nn.softplus(jnp.exp(x)))
    np.testing.assert_allclose(b.inverse(b.forward(x)), x, rtol=1e-9)
    jac = jax.vmap(jax.grad(lambda t: b.forward(t)))(x)
    np.testing.assert_allclose(
        b.forward_log_det_jacobian(x), jnp.log(jnp.abs(jac)), rtol=1e-9
    )
