"""DDColor architecture: shapes, finiteness, driver flow, jit."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from havc_tpu.models import ddcolor as dd


@pytest.fixture(scope="module")
def tiny():
    model = dd.DDColor.from_config("micro")
    params = dd.init_params(model, input_size=64)
    return model, params


def test_forward_shape(tiny):
    model, params = tiny
    x = jnp.zeros((1, 64, 64, 3), jnp.float32) + 0.5
    ab = model.apply(params, x)
    assert ab.shape == (1, 64, 64, 2)
    assert np.isfinite(np.asarray(ab)).all()


def test_ab_scale_bounded(tiny):
    model, params = tiny
    x = jnp.zeros((2, 64, 64, 3), jnp.float32) + 0.5
    ab = np.asarray(model.apply(params, x))
    # random init should produce small ab, not NaN or huge values
    assert np.abs(ab).max() < 500


def test_driver_preserves_luma_with_bounded_ab(tiny):
    """The driver joins predicted ab with the ORIGINAL luma; with a model
    stub emitting in-gamut ab the luma must survive exactly.  (The real
    model at random init emits out-of-gamut ab whose RGB clipping shifts L
    — an init artifact, not a driver property.)"""

    class StubModel:
        def apply(self, params, x):
            return jnp.full(x.shape[:-1] + (2,), 8.0, x.dtype)  # mild ab

    rng = np.random.default_rng(0)
    gray = np.tile(
        (0.2 + 0.6 * rng.random((1, 96, 80, 1))).astype(np.float32), (1, 1, 1, 3)
    )
    out = np.asarray(dd.colorize(None, jnp.asarray(gray), StubModel(), input_size=64))
    from havc_tpu.ops.colorspace import rgb_to_lab

    l_in = np.asarray(rgb_to_lab(jnp.asarray(gray)))[..., 0]
    l_out = np.asarray(rgb_to_lab(jnp.asarray(out)))[..., 0]
    assert np.abs(l_in - l_out).mean() < 0.5
    ab = np.asarray(rgb_to_lab(jnp.asarray(out)))[..., 1:]
    assert ab.mean() > 2.0  # chroma actually injected


def test_real_model_driver_in_range(tiny):
    model, params = tiny
    rng = np.random.default_rng(0)
    gray = np.tile(rng.random((1, 96, 80, 1), dtype=np.float32), (1, 1, 1, 3))
    out = np.asarray(dd.colorize(params, jnp.asarray(gray), model, input_size=64))
    assert out.shape == gray.shape
    assert np.isfinite(out).all() and out.min() >= 0 and out.max() <= 1


def test_jit_and_batch(tiny):
    model, params = tiny
    fn = jax.jit(lambda p, x: model.apply(p, x))
    x = jnp.zeros((2, 64, 64, 3), jnp.float32) + 0.3
    ab = fn(params, x)
    assert ab.shape == (2, 64, 64, 2)
    # per-sample independence: same input -> same output within batch
    assert np.abs(np.asarray(ab[0]) - np.asarray(ab[1])).max() < 1e-5


def test_configs_exist():
    for name in ("tiny", "large", "artistic", "modelscope"):
        m = dd.DDColor.from_config(name)
        assert m.num_queries == 100
