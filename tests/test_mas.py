"""On-device MAS vs the NumPy oracle (reference semantics,
``FastPitch_TF/alignment.py``). SURVEY §4.1 oracle-diff methodology."""

import numpy as np
import jax.numpy as jnp

from neuraltexttospeech_tpu.ops.mas import b_mas, mas_width1_numpy, maximum_path


def _random_log_attn(rng, t_mel, t_text):
    # Log-softmax-like values: negative, batched.
    x = rng.standard_normal((t_mel, t_text))
    x = x - np.log(np.sum(np.exp(x), axis=-1, keepdims=True))
    return x.astype(np.float32)


def test_matches_numpy_oracle_full_lengths():
    rng = np.random.default_rng(0)
    T_mel, T_text = 37, 11
    la = _random_log_attn(rng, T_mel, T_text)
    expected = mas_width1_numpy(la)
    got = np.asarray(maximum_path(la[None], jnp.array([T_text]), jnp.array([T_mel])))[0]
    np.testing.assert_array_equal(got, expected)


def test_batched_variable_lengths():
    rng = np.random.default_rng(1)
    B, T_mel, T_text = 4, 53, 17
    in_lens = np.array([17, 9, 13, 5])
    out_lens = np.array([53, 30, 41, 22])
    la = np.stack([_random_log_attn(rng, T_mel, T_text) for _ in range(B)])
    got = np.asarray(maximum_path(la, jnp.array(in_lens), jnp.array(out_lens)))
    for b in range(B):
        expected = mas_width1_numpy(la[b, : out_lens[b], : in_lens[b]])
        np.testing.assert_array_equal(
            got[b, : out_lens[b], : in_lens[b]], expected, err_msg=f"sample {b}"
        )
        # Padding stays zero.
        assert got[b, out_lens[b]:].sum() == 0
        assert got[b, :, in_lens[b]:].sum() == 0


def test_path_properties():
    """Every valid mel row selects exactly one symbol; durations sum to mel len;
    path is monotonic and complete (reference model.py:317 assertion)."""
    rng = np.random.default_rng(2)
    B, T_mel, T_text = 3, 64, 21
    in_lens = np.array([21, 10, 15])
    out_lens = np.array([64, 40, 50])
    la = np.stack([_random_log_attn(rng, T_mel, T_text) for _ in range(B)])
    path = np.asarray(maximum_path(la, jnp.array(in_lens), jnp.array(out_lens)))
    for b in range(B):
        p = path[b, : out_lens[b], : in_lens[b]]
        assert (p.sum(axis=1) == 1).all()              # one symbol per frame
        durs = p.sum(axis=0)
        assert durs.sum() == out_lens[b]               # duration completeness
        assert (durs >= 1).all()                       # every symbol visited
        sel = p.argmax(axis=1)
        assert ((np.diff(sel) == 0) | (np.diff(sel) == 1)).all()  # monotonic
        assert sel[0] == 0 and sel[-1] == in_lens[b] - 1


def test_b_mas_shim_shape():
    rng = np.random.default_rng(3)
    la = np.stack([_random_log_attn(rng, 20, 7) for _ in range(2)])[:, None]
    out = np.asarray(b_mas(la, np.array([7, 5]), np.array([20, 12])))
    assert out.shape == la.shape
