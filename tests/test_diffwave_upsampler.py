"""The stencil twin of the DiffWave mel upsampler must equal the flax
ConvTranspose it replaces (reference ``DiffWave_TF/model.py:114-146``) —
values AND gradients, on the same param tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from neuraltexttospeech_tpu.models.diffwave import (
    SpectrogramUpsampler, _StencilConvTranspose16)


class _FlaxUpsampler(nn.Module):
    """The original implementation, kept as the oracle."""

    @nn.compact
    def __call__(self, x):
        x = x[..., None]
        for _ in range(2):
            x = nn.ConvTranspose(1, (32, 3), strides=(16, 1),
                                 padding="SAME", transpose_kernel=True)(x)
            x = nn.leaky_relu(x, 0.4)
        return x[..., 0]


@pytest.mark.parametrize("F,M", [(9, 80), (62, 80), (5, 3)])
def test_stencil_matches_convtranspose(F, M):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, F, M))
    ref = _FlaxUpsampler()
    p = ref.init(key, x)
    got = SpectrogramUpsampler().apply(p, x)   # same param tree by design
    want = ref.apply(p, x)
    assert got.shape == want.shape == (2, F * 16 * 16, M)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               rtol=0, atol=1e-4)


def test_stencil_gradients_match():
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (1, 7, 11))
    ref = _FlaxUpsampler()
    p = ref.init(key, x)

    def loss(model, p, x):
        return jnp.sum(jnp.sin(model.apply(p, x)))

    g_ref = jax.grad(loss, argnums=(1, 2))(ref, p, x)
    g_new = jax.grad(loss, argnums=(1, 2))(SpectrogramUpsampler(), p, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_new)):
        np.testing.assert_allclose(np.array(a), np.array(b),
                                   rtol=0, atol=1e-4)


def test_single_layer_matches():
    """One layer alone, so a failure localizes."""
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (3, 4, 6))

    class _One(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.ConvTranspose(1, (32, 3), strides=(16, 1),
                                    padding="SAME",
                                    transpose_kernel=True)(x[..., None])[..., 0]

    ref = _One()
    p = ref.init(key, x)
    p2 = {"params": p["params"]["ConvTranspose_0"]}
    got = _StencilConvTranspose16().apply(p2, x)
    np.testing.assert_allclose(np.array(got), np.array(ref.apply(p, x)),
                               rtol=0, atol=1e-5)
