"""Smaller subsystems: prior interpolator, model registry, distributed
no-op init, profiling timer, plotting."""

import numpy as np

from neuraltexttospeech_tpu.data.prior import (
    BetaBinomialInterpolator, beta_binomial_prior_distribution,
)
from neuraltexttospeech_tpu.models.registry import (
    MODEL_REGISTRY, get_model, get_model_config,
)
from neuraltexttospeech_tpu.parallel.distributed import initialize_distributed


def test_prior_matches_reference_semantics():
    """Rows are betabinom(P, i, M+1-i).pmf over 0..P-1 — the support point
    at x=P is dropped exactly like the reference
    (``FastPitch_TF/data_function.py:80-91``), so late rows sum below 1."""
    prior = beta_binomial_prior_distribution(17, 40)
    assert prior.shape == (40, 17)
    sums = prior.sum(axis=1)
    np.testing.assert_allclose(sums[:10], 1.0, atol=1e-4)  # early rows ≈ 1
    assert (sums <= 1.0 + 1e-6).all() and (sums > 0.1).all()
    # monotone drift: later mel frames weight later phonemes
    assert prior[-1].argmax() > prior[0].argmax()


def test_prior_interpolator_close_to_exact():
    interp = BetaBinomialInterpolator()
    approx = interp(130, 37)
    exact = beta_binomial_prior_distribution(37, 130)
    assert approx.shape == exact.shape == (130, 37)
    # zoom interpolation is approximate at the sharp corners (reference
    # accepts the tradeoff, data_function.py:49-77); interior agreement is
    # what matters for the alignment prior
    assert np.abs(approx - exact).max() < 0.1
    assert np.abs(approx - exact).mean() < 0.005


def test_registry_has_all_eight_families():
    assert set(MODEL_REGISTRY) == {
        "FastPitch", "FastSpeech2", "Tacotron2", "GradTTS", "Flowtron",
        "QuartzNet", "HiFiGAN", "DiffWave"}
    cfg = get_model_config("FastPitch", n_symbols=50)
    assert cfg.n_symbols == 50
    model = get_model("DiffWave")
    assert model.config.residual_layers == 30


def test_initialize_distributed_single_process_noop(monkeypatch):
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("NUM_PROCESSES", raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize_distributed() is False


def test_step_timer():
    from neuraltexttospeech_tpu.utils.profiling import StepTimer

    t = StepTimer(window=4)
    for _ in range(5):
        t.tick(8)
    assert t.steps_per_sec and t.steps_per_sec > 0
    assert t.items_per_sec and t.items_per_sec > 0


def test_plotting_roundtrip():
    from neuraltexttospeech_tpu.utils.plotting import (
        plot_alignment, plot_spectrogram, save_figure_to_numpy,
    )

    fig = plot_spectrogram(np.random.default_rng(0).standard_normal((40, 80)))
    img = save_figure_to_numpy(fig)
    assert img.ndim == 3 and img.shape[-1] == 3
    fig2 = plot_alignment(np.eye(20))
    assert fig2 is not None


def test_attrdict_override():
    from neuraltexttospeech_tpu.utils.masking import AttrDict

    a = AttrDict(x=1)
    a.override({"y": 2}).override([{"z": 3}, None])
    assert (a.x, a.y, a.z) == (1, 2, 3)
    assert a["y"] == 2


def test_flowtron_decoder_stack_depth():
    from neuraltexttospeech_tpu.models.flowtron import ARStep, FlowtronConfig

    cfg = FlowtronConfig(n_lstm_layers=2, n_hidden=8, n_mel_channels=4,
                         n_attn_channels=8, n_text_dim=8)
    step = ARStep(cfg)
    import jax
    import jax.numpy as jnp

    params = step.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 4)),
                       jnp.zeros((1, 5, 8 + cfg.n_speaker_dim)),
                       jnp.full((1,), 5, jnp.int32),
                       jnp.full((1,), 6, jnp.int32))
    names = set(params["params"])
    assert {"decoder_cells_0", "decoder_cells_1"} <= names


def test_serving_sharding_spans_all_devices():
    import jax

    from neuraltexttospeech_tpu.utils.serving import serving_sharding

    put, replicate, bs = serving_sharding(5)
    n_dev = len(jax.devices())
    assert bs % n_dev == 0 and bs >= 5
    x = put(np.zeros((bs, 16), np.int32))
    # the batch dim is sharded across every visible device
    assert len(x.sharding.device_set) == n_dev
    assert x.sharding.shard_shape(x.shape)[0] == bs // n_dev
    # params replicate over the same mesh (restored checkpoints are
    # committed to one device, which jit refuses to mix with sharded input)
    p = replicate({"w": np.ones((4, 4), np.float32)})
    assert len(p["w"].sharding.device_set) == n_dev
    assert p["w"].sharding.shard_shape(p["w"].shape) == (4, 4)


def test_serving_text_batches_covers_all_rows_in_buckets():
    from neuraltexttospeech_tpu.utils.serving import round_up, text_batches

    assert round_up(1, 16) == 16 and round_up(16, 16) == 16
    assert round_up(17, 128) == 128

    rng = np.random.default_rng(0)
    encoded = [rng.integers(1, 100, size=n).astype(np.int32)
               for n in [7, 33, 12, 40, 3, 19, 25]]
    seen = []
    for idxs, text, lens in text_batches(encoded, batch_size=3):
        # static batch dim, bucketed text dim
        assert text.shape[0] == 3 and text.shape[1] % 16 == 0
        # batches are shortest-first so each batch pads to its own bucket
        for r, j in enumerate(idxs):
            n = len(encoded[j])
            assert lens[r] == n
            np.testing.assert_array_equal(text[r, :n], encoded[j])
            assert not text[r, n:].any()
        # pad rows (beyond the real ones) carry lens == 1
        assert (lens[len(idxs):] == 1).all()
        seen += list(idxs)
    assert sorted(seen) == list(range(len(encoded)))


def test_device_beta_binomial_prior_matches_scipy():
    """ops/prior.py (on-device, f32 gammaln) vs data/prior.py (scipy f64):
    <=2e-3 abs on LJSpeech-scale shapes, exact zero padding."""
    import jax.numpy as jnp

    from neuraltexttospeech_tpu.data.prior import (
        beta_binomial_prior_distribution,
    )
    from neuraltexttospeech_tpu.ops.prior import beta_binomial_prior

    mel_lens = jnp.asarray([896, 700, 64, 850], jnp.int32)
    text_lens = jnp.asarray([144, 100, 12, 77], jnp.int32)
    dev = np.asarray(beta_binomial_prior(mel_lens, text_lens, 896, 144))
    for bi in range(4):
        M, P = int(mel_lens[bi]), int(text_lens[bi])
        host = beta_binomial_prior_distribution(P, M)
        np.testing.assert_allclose(dev[bi, :M, :P], host, atol=2e-3)
        if M < 896:
            assert float(np.abs(dev[bi, M:, :]).max()) == 0.0
        if P < 144:
            assert float(np.abs(dev[bi, :, P:]).max()) == 0.0
