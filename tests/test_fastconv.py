"""Folded (space-to-depth) convs must equal the stock flax layers exactly —
same param tree, same values, same gradients (``nn/fastconv.py``; motivation:
the C=32 HiFi-GAN tail, reference ``HiFiGAN_TF/model.py:115-173``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from neuraltexttospeech_tpu.nn import fastconv


@pytest.mark.parametrize("k,d", [(1, 1), (3, 1), (7, 1), (11, 1),
                                 (3, 3), (3, 5), (7, 3), (7, 5),
                                 (11, 3), (11, 5),
                                 # d % p == 0 -> the dilated folded path
                                 # (DiffWave's power-of-two dilations)
                                 (3, 2), (3, 4), (3, 8)])
@pytest.mark.parametrize("p", [2, 4])
def test_folded_conv_matches_nn_conv(k, d, p):
    ci, co, B, L = 6, 5, 2, 24
    ref = nn.Conv(co, (k,), kernel_dilation=(d,), padding="SAME")
    fc = fastconv.Conv(co, (k,), kernel_dilation=(d,), padding="SAME",
                       fold=p)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)
    # identical param tree by construction
    want = ref.apply(params, x)
    got = fastconv.unfold(fc.apply(params, fastconv.fold(x, p)), p)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k,u", [(4, 2), (16, 8), (8, 4)])
@pytest.mark.parametrize("pi", [1, 2])
def test_folded_convtranspose_matches_flax(k, u, pi):
    ci, co, B, L = 6, 5, 2, 8 * pi
    ref = nn.ConvTranspose(co, (k,), strides=(u,), padding="SAME",
                           transpose_kernel=True)
    fc = fastconv.ConvTranspose(co, (k,), strides=(u,), padding="SAME",
                                transpose_kernel=True, fold=pi)
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)
    want = ref.apply(params, x)
    got = fastconv.unfold(fc.apply(params, fastconv.fold(x, pi)), u * pi)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


def test_folded_conv_gradients_match():
    k, d, p, ci, co, B, L = 7, 3, 4, 4, 4, 1, 32
    ref = nn.Conv(co, (k,), kernel_dilation=(d,), padding="SAME")
    fc = fastconv.Conv(co, (k,), kernel_dilation=(d,), padding="SAME",
                       fold=p)
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)

    def loss_ref(prm, xx):
        return jnp.sum(jnp.sin(ref.apply(prm, xx)))

    def loss_fold(prm, xx):
        return jnp.sum(jnp.sin(fastconv.unfold(
            fc.apply(prm, fastconv.fold(xx, p)), p)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1))(params, x)
    g_fold = jax.grad(loss_fold, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fold)):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   atol=1e-5, rtol=1e-5)


def test_weightnorm_wrapping_unchanged():
    """nn.WeightNorm over the folded Conv must produce the same params AND
    outputs as over nn.Conv (the HiFi-GAN generator wraps every conv)."""
    k, p, ci, co, B, L = 3, 2, 4, 4, 2, 16
    ref = nn.WeightNorm(nn.Conv(co, (k,), padding="SAME"))
    fc = nn.WeightNorm(fastconv.Conv(co, (k,), padding="SAME", fold=p))
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, L, ci))
    params = ref.init(key, x)
    params_f = fc.init(key, fastconv.fold(x, p))
    assert (jax.tree.structure(params) == jax.tree.structure(params_f))
    want = ref.apply(params, x)
    got = fastconv.unfold(fc.apply(params, fastconv.fold(x, p)), p)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


def test_diffwave_folded_matches_stock():
    """DiffWave folded residual stack (power-of-two dilations through the
    dilated d%p==0 fold path + per-position gate/skip splits) must equal the
    stock network on the same params."""
    import dataclasses
    from neuraltexttospeech_tpu.models.diffwave import DiffWave, DiffWaveConfig

    cfg = DiffWaveConfig(residual_layers=6, residual_channels=8,
                         dilation_cycle_length=3, n_mels=8, hop_length=16,
                         crop_mel_frames=4)
    key = jax.random.PRNGKey(0)
    B, F = 2, cfg.crop_mel_frames
    audio = jax.random.normal(key, (B, F * cfg.hop_length))
    mel = jax.random.normal(jax.random.PRNGKey(1), (B, F, cfg.n_mels))
    t = jnp.array([3, 7])
    m_s = DiffWave(dataclasses.replace(cfg, folded_convs=False))
    m_f = DiffWave(dataclasses.replace(cfg, folded_convs=True))
    params = m_s.init(key, audio, t, mel)
    params_f = m_f.init(key, audio, t, mel)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    want = m_s.apply(params, audio, t, mel)
    got = m_f.apply(params, audio, t, mel)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)
    # fractional (fast-sampling) steps exercise the same folded graph
    got_frac = m_f.apply(params, audio, jnp.array([1.5, 2.25]), mel)
    want_frac = m_s.apply(params, audio, jnp.array([1.5, 2.25]), mel)
    np.testing.assert_allclose(np.array(got_frac), np.array(want_frac),
                               atol=1e-5, rtol=1e-5)


def test_generator_folded_matches_stock():
    """Full HiFi-GAN generator: folded_convs=True must equal the stock path
    on the same params (the tail runs C=64 @ fold 2, C=32 @ fold 4)."""
    import dataclasses
    from neuraltexttospeech_tpu.models.hifigan import Generator, HiFiGANConfig

    cfg = HiFiGANConfig(upsample_initial_channel=64,
                        upsample_rates=(4, 2, 2),
                        upsample_kernel_sizes=(8, 4, 4),
                        resblock_kernel_sizes=(3, 7),
                        resblock_dilation_sizes=((1, 3), (1, 5)))
    key = jax.random.PRNGKey(0)
    mel = jax.random.normal(key, (2, 16, cfg.num_mels))
    gen_f = Generator(dataclasses.replace(cfg, folded_convs=True))
    gen_s = Generator(dataclasses.replace(cfg, folded_convs=False))
    params = gen_s.init(key, mel)
    params_f = gen_f.init(key, mel)
    assert jax.tree.structure(params) == jax.tree.structure(params_f)
    want = gen_s.apply(params, mel)
    got = gen_f.apply(params, mel)
    assert want.shape == got.shape
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cin,cout,k,s,g", [
    (8, 8, 41, 2, 4),    # MSD layer-2 shape class (per-group ci=co)
    (8, 16, 5, 2, 4),    # ci != co per group
    (16, 32, 41, 4, 16), # MSD deep layers' group count
    (8, 8, 15, 1, 2),    # stride 1
])
def test_bgc_grouped_conv_matches_nn_conv(cin, cout, k, s, g):
    """The batch_group_count lowering of a grouped conv must equal stock
    nn.Conv — same param tree, values, and gradients (``fastconv.Conv
    group_impl="bgc"``; motivation: the HiFi-GAN MSD's 41-tap grouped
    stacks, reference ``HiFiGAN_TF/model.py:279-351``)."""
    B, L = 2, 48
    ref = nn.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                  padding="SAME")
    fc = fastconv.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                       padding="SAME", group_impl="bgc")
    key = jax.random.PRNGKey(4)
    x = jax.random.normal(key, (B, L, cin))
    params = ref.init(key, x)
    params_b = fc.init(key, x)
    assert jax.tree.structure(params) == jax.tree.structure(params_b)
    want = ref.apply(params, x)
    got = fc.apply(params, x)
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=1e-5, rtol=1e-5)

    def loss(prm, xx, mod):
        return jnp.sum(jnp.sin(mod.apply(prm, xx)))

    g_ref = jax.grad(loss, argnums=(0, 1))(params, x, ref)
    g_bgc = jax.grad(loss, argnums=(0, 1))(params, x, fc)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_bgc)):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("cout,k,s,g,pi", [
    (128, 41, 2, 4, 8),     # MSD L2 (ci=32/group)
    (256, 41, 2, 16, 16),   # MSD L3
    (512, 41, 4, 16, 32),   # MSD L4 at the scheduled deep fold
    (1024, 41, 4, 16, 8),   # MSD L5
    (1024, 41, 1, 16, 2),   # MSD L6 (stride 1, fold 2)
    (64, 3, 2, 1, 4),       # strided g=1 (new: fold != output fold)
    (24, 5, 3, 2, 6),       # stride 3, small groups
])
def test_folded_grouped_strided_conv_matches_nn_conv(cout, k, s, g, pi):
    """The group-major folded lowering of a strided grouped conv must
    equal stock nn.Conv — values and gradients. This is the SPMD-safe
    grouped-conv fast path (``fold_grouped`` + ``Conv(fold=Pi)``, output
    folded by Pi/stride; motivation: the HiFi-GAN MSD's 41-tap grouped
    stacks, reference ``HiFiGAN_TF/model.py:279-351``)."""
    cin = cout if cout <= 128 else cout // 2
    B, L = 2, 4 * pi * s
    ref = nn.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                  padding="SAME")
    fc = fastconv.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                       padding="SAME", fold=pi)
    key = jax.random.PRNGKey(5)
    x = jax.random.normal(key, (B, L, cin))
    params = ref.init(key, x)
    want = ref.apply(params, x)
    got = fastconv.unfold_grouped(
        fc.apply(params, fastconv.fold_grouped(x, pi, g)), pi // s, g)
    assert want.shape == got.shape
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=2e-5, rtol=2e-5)

    def loss(prm, xx):
        y = fc.apply(prm, fastconv.fold_grouped(xx, pi, g))
        return jnp.sum(jnp.sin(fastconv.unfold_grouped(y, pi // s, g)))

    g_ref = jax.grad(lambda prm, xx: jnp.sum(jnp.sin(ref.apply(prm, xx))),
                     argnums=(0, 1))(params, x)
    g_fold = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_fold)):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("cout,k,s,g,pi", [
    (128, 41, 2, 4, 8),     # MSD L2 (ci=32/group)
    (256, 41, 2, 16, 16),   # MSD L3
    (512, 41, 4, 16, 32),   # MSD L4 at the scheduled deep fold
    (1024, 41, 4, 16, 8),   # MSD L5
    (1024, 41, 1, 16, 2),   # MSD L6 (stride 1, fold 2)
    (64, 15, 1, 1, 4),      # g=1 (group dim of size 1)
    (24, 5, 3, 2, 6),       # stride 3, small groups
])
def test_gouter_grouped_conv_matches_nn_conv(cout, k, s, g, pi):
    """The group-OUTERMOST folded lowering (``layout="gouter"``: each
    folded tap a group-batched dot_general on [g, B, Q, Pi*ci]) must equal
    stock nn.Conv — same param tree, values, and gradients. This is the
    relayout-free MSD fast path (motivation: the 26 ms inter-layer
    transpose bucket of the round-4 GAN-step trace, PERF.md; reference
    ``HiFiGAN_TF/model.py:279-351``)."""
    cin = cout if cout <= 128 else cout // 2
    B, L = 2, 4 * pi * s
    ref = nn.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                  padding="SAME")
    fc = fastconv.Conv(cout, (k,), strides=(s,), feature_group_count=g,
                       padding="SAME", fold=pi, layout="gouter")
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (B, L, cin))
    params = ref.init(key, x)
    params_g = fc.init(key, fastconv.fold_gouter(x, pi, g))
    assert jax.tree.structure(params) == jax.tree.structure(params_g)
    assert (jax.tree.leaves(params)[0].shape
            == jax.tree.leaves(params_g)[0].shape)
    want = ref.apply(params, x)
    got = fastconv.unfold_gouter(
        fc.apply(params, fastconv.fold_gouter(x, pi, g)), pi // s, g)
    assert want.shape == got.shape
    np.testing.assert_allclose(np.array(got), np.array(want),
                               atol=2e-5, rtol=2e-5)

    def loss(prm, xx):
        y = fc.apply(prm, fastconv.fold_gouter(xx, pi, g))
        return jnp.sum(jnp.sin(fastconv.unfold_gouter(y, pi // s, g)))

    g_ref = jax.grad(lambda prm, xx: jnp.sum(jnp.sin(ref.apply(prm, xx))),
                     argnums=(0, 1))(params, x)
    g_out = jax.grad(loss, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_out)):
        np.testing.assert_allclose(np.array(b), np.array(a),
                                   atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("cur_po,cur_g,pi,g", [
    (4, 4, 8, 16),   # MSD L2->L3: fold AND group refinement
    (8, 16, 32, 16), # MSD L3->L4: fold refinement at equal g
    (8, 16, 8, 16),  # equal layout: identity
    (2, 16, 2, 16),  # L5->L6 chained layout: identity
    (8, 16, 2, 16),  # fold coarsening -> plain-layout fallback
    (4, 8, 6, 8),    # non-divisible refinement -> fallback
    (4, 16, 8, 4),   # group coarsening -> fallback
])
def test_regroup_gouter_matches_unfold_refold(cur_po, cur_g, pi, g):
    """``regroup_gouter`` (the free-reshape inter-layer relayout of the
    gouter path) must equal the reference relayout
    ``fold_gouter(unfold_gouter(x))`` for every (fold, group) transition
    in the MSD schedule and for the fallback cases."""
    B, Q, co = 2, 12, 8
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((cur_g, B, Q, cur_po * co)),
                    jnp.float32)
    want = fastconv.fold_gouter(
        fastconv.unfold_gouter(x, cur_po, cur_g), pi, g)
    got = fastconv.regroup_gouter(x, cur_po, cur_g, pi, g)
    assert got.shape == want.shape
    np.testing.assert_array_equal(np.array(got), np.array(want))


def test_fold_gouter_roundtrip():
    B, L, g, p, c = 2, 24, 4, 3, 16
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, L, g * c)), jnp.float32)
    y = fastconv.fold_gouter(x, p, g)
    assert y.shape == (g, B, L // p, p * c)
    np.testing.assert_array_equal(
        np.array(fastconv.unfold_gouter(y, p, g)), np.array(x))


def test_fold_bgc_exclusive():
    fc = fastconv.Conv(8, (3,), feature_group_count=2, padding="SAME",
                       fold=2, group_impl="bgc")
    x = jnp.zeros((1, 8, 8))
    with pytest.raises(ValueError, match="exclusive"):
        fc.init(jax.random.PRNGKey(0), x)


def test_msd_folded_schedule_chains_layouts():
    """The backward-planned MSD fold schedule reuses layouts: L4->L5->L6
    share folds (no relayout), every folded layer fills >=128 output
    lanes, and g=1 layers stay unfolded."""
    from neuraltexttospeech_tpu.models.hifigan import DiscriminatorS

    sched = DiscriminatorS._folded_schedule(DiscriminatorS.SPECS)
    assert sched == [None, (8, 4), (16, 8), (32, 8), (8, 2), (2, 2), None]
    for (pi, po), (ch, _, s, g) in zip(
            [sc for sc in sched if sc], [sp for sp, sc in
                                         zip(DiscriminatorS.SPECS, sched) if sc]):
        assert pi == s * po
        assert po * (ch // g) >= 128


@pytest.mark.parametrize("fast_impl", ["folded", "gdot"])
def test_msd_folded_matches_stock_odd_length(fast_impl):
    """Folded/gouter MSD on a non-power-of-two length: unfoldable layers
    fall back per-layer; scores and per-layer feature-L1 still match
    stock."""
    from neuraltexttospeech_tpu.models.hifigan import MultiScaleDiscriminator

    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((2, 100, 1)) * 0.1, jnp.float32)
    yh = jnp.asarray(rng.standard_normal((2, 100, 1)) * 0.1, jnp.float32)
    outs = {}
    p0 = None
    for impl in ("stock", fast_impl):
        msd = MultiScaleDiscriminator(group_impl=impl)
        v = msd.init(jax.random.PRNGKey(0), y, yh)
        if p0 is None:
            p0 = v
        assert jax.tree.structure(v) == jax.tree.structure(p0)
        (rs, gs, fr, fg), _ = msd.apply(p0, y, yh, update_stats=True,
                                        mutable=["batch_stats"])
        fl1 = [float(jnp.mean(jnp.abs(a - b)))
               for la, lb in zip(fr, fg) for a, b in zip(la, lb)]
        outs[impl] = (rs, gs, fl1)
    for a, b in zip(jax.tree.leaves(outs["stock"][:2]),
                    jax.tree.leaves(outs[fast_impl][:2])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(outs["stock"][2], outs[fast_impl][2],
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape", [
    # (g, B, q, X, Y, kf, s): an MSD-like tile and a strided-tap case
    (4, 2, 32, 128, 128, 3, 1),
    (2, 2, 16, 256, 128, 4, 2),
])
def test_gouter_pallas_kernel_matches_xla_tap_dots(shape):
    """The Pallas tap-window kernel (ops/gouter_kernel.py) computes the
    exact gdot tap sum (interpret mode on CPU; on-chip A/B in
    tools/bench_gouter_pallas.py / PERF.md round 5)."""
    from jax.experimental.pallas import tpu as pltpu

    from neuraltexttospeech_tpu.ops.gouter_kernel import (
        gouter_tap_dots_pallas, pallas_eligible,
    )

    g, B, q, X, Y, kf, s = shape
    rng = np.random.default_rng(1)
    xp = jnp.asarray(rng.standard_normal((g, B, q + (kf - 1) * s, X)),
                     jnp.float32)
    wf = jnp.asarray(rng.standard_normal((kf, g, X, Y)), jnp.float32)
    assert pallas_eligible(xp.shape, wf.shape, q, xp.dtype)

    y_ref = None
    for mf in range(kf):
        sl = jax.lax.slice_in_dim(xp, mf * s, mf * s + q, axis=2)
        t = jax.lax.dot_general(sl, wf[mf], (((3,), (1,)), ((0,), (0,))))
        y_ref = t if y_ref is None else y_ref + t
    with pltpu.force_tpu_interpret_mode():
        y = gouter_tap_dots_pallas(xp, wf, s=s, q=q)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


def test_gouter_tap_dots_custom_vjp_matches_xla_grads():
    """gouter_tap_dots (Pallas fwd + XLA-dots bwd custom_vjp) must produce
    the same gradients as the plain XLA tap loop."""
    from jax.experimental.pallas import tpu as pltpu

    from neuraltexttospeech_tpu.nn.fastconv import gouter_tap_dots

    g, B, q, X, Y, kf, s = 2, 2, 16, 128, 128, 3, 2
    rng = np.random.default_rng(2)
    xp = jnp.asarray(rng.standard_normal((g, B, q + (kf - 1) * s, X)),
                     jnp.float32)
    wf = jnp.asarray(rng.standard_normal((kf, g, X, Y)), jnp.float32)
    tgt = jnp.asarray(rng.standard_normal((g, B, q, Y)), jnp.float32)

    def xla_loss(xp, wf):
        y = None
        for mf in range(kf):
            sl = jax.lax.slice_in_dim(xp, mf * s, mf * s + q, axis=2)
            t = jax.lax.dot_general(sl, wf[mf], (((3,), (1,)), ((0,), (0,))))
            y = t if y is None else y + t
        return jnp.mean(jnp.square(y - tgt))

    def pl_loss(xp, wf):
        return jnp.mean(jnp.square(gouter_tap_dots(xp, wf, s, q) - tgt))

    gx_ref, gw_ref = jax.grad(xla_loss, argnums=(0, 1))(xp, wf)
    with pltpu.force_tpu_interpret_mode():
        gx, gw = jax.grad(pl_loss, argnums=(0, 1))(xp, wf)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=1e-5, atol=1e-6)
