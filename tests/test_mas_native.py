"""Native C++ MAS kernel vs the NumPy oracle and the device kernel."""

import numpy as np
import pytest

from neuraltexttospeech_tpu.ops import mas_native
from neuraltexttospeech_tpu.ops.mas import mas_width1_numpy

pytestmark = pytest.mark.skipif(
    not mas_native.available(), reason="no native toolchain")


def test_native_matches_oracle_batched():
    rng = np.random.default_rng(0)
    B, Tm, Tt = 4, 60, 19
    la = rng.standard_normal((B, Tm, Tt)).astype(np.float32)
    in_lens = np.array([19, 11, 15, 7], np.int32)
    out_lens = np.array([60, 40, 50, 22], np.int32)
    path = mas_native.b_mas_native(la, in_lens, out_lens)
    for b in range(B):
        exp = mas_width1_numpy(la[b, : out_lens[b], : in_lens[b]])
        np.testing.assert_array_equal(
            path[b, : out_lens[b], : in_lens[b]], exp, err_msg=f"sample {b}")
        assert path[b, out_lens[b]:].sum() == 0
        assert path[b, :, in_lens[b]:].sum() == 0


def test_native_matches_device_kernel():
    import jax.numpy as jnp
    from neuraltexttospeech_tpu.ops.mas import maximum_path

    rng = np.random.default_rng(1)
    la = rng.standard_normal((2, 40, 13)).astype(np.float32)
    in_lens = np.array([13, 9], np.int32)
    out_lens = np.array([40, 25], np.int32)
    native = mas_native.b_mas_native(la, in_lens, out_lens)
    device = np.asarray(maximum_path(jnp.asarray(la), jnp.asarray(in_lens),
                                     jnp.asarray(out_lens)))
    np.testing.assert_array_equal(native, device)
