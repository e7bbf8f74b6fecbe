"""HiFi-GAN vocoder — generator, MPD/MSD discriminators, GAN losses.

TPU-native re-design of ``HiFiGAN_TF/model.py`` (518 LoC) + ``losses.py`` +
the GAN harness ``gan.py``:

- weight/spectral normalization are explicit flax parametrizations
  (``nn.WeightNorm`` g·v/‖v‖ factorization, ``nn.SpectralNorm`` power
  iteration) instead of the reference's tensorflow-addons wrappers
  (``model.py:7-9`` — SURVEY §7 hard parts);
- the three Adam optimizers and two gradient lanes of the reference harness
  (``gan.py:32-131``) become a single jitted step with three optax states;
  XLA CSEs the duplicated generator forward between the lanes;
- the mel-reconstruction loss re-runs the batched STFT **on device** in one
  fused call — the reference unstacked the batch and looped per-sample on
  host (``gan.py:47-52``).

Config values (v1/v2/v3) mirror ``HiFiGAN_TF/config_v{1,2,3}.json``.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from neuraltexttospeech_tpu.nn import fastconv

__all__ = [
    "HiFiGANConfig", "Generator", "MultiPeriodDiscriminator",
    "MultiScaleDiscriminator", "feature_loss", "discriminator_loss",
    "generator_loss",
]

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HiFiGANConfig:
    resblock: str = "1"
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5), (1, 3, 5), (1, 3, 5))
    num_mels: int = 80
    segment_size: int = 8192
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    sampling_rate: int = 22050
    fmin: float = 0.0
    fmax: float = 8000.0
    fmax_for_loss: Optional[float] = None
    # training (reference config_v1.json)
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999
    seed: int = 1234
    batch_size: int = 16
    dtype: Optional[jnp.dtype] = None
    # Space-to-depth folded convs on the low-channel tail (C < 128): exact
    # same math/params, ~128-lane MXU tiles instead of quarter-filled ones
    # (see nn/fastconv.py). Off = stock flax convs everywhere.
    folded_convs: bool = True
    # MSD grouped-conv lowering. None (default) = the fastest measured
    # SPMD-safe impl (see models/hifigan_gan.py:resolve_msd_group_impl for
    # the current winner + full-step A/B numbers). Explicit string picks
    # one impl: "gdot" (group-outermost folded dot_general), "folded"
    # (group-major space-to-depth conv), "stock" (plain flax), "bgc"
    # (legacy batch_group_count — XLA's SPMD partitioner cannot split it,
    # so it RAISES on a sharded batch rather than letting XLA abort).
    # Bools kept for config back-compat: True = "bgc", False = "stock".
    fast_grouped_convs: Optional[Union[bool, str]] = None

    @classmethod
    def v1(cls, **kw) -> "HiFiGANConfig":
        return cls(**kw)

    @classmethod
    def v2(cls, **kw) -> "HiFiGANConfig":
        return cls(resblock="1", upsample_rates=(8, 8, 2, 2),
                   upsample_kernel_sizes=(16, 16, 4, 4),
                   upsample_initial_channel=128,
                   resblock_kernel_sizes=(3, 7, 11),
                   resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
                   **kw)

    @classmethod
    def v3(cls, **kw) -> "HiFiGANConfig":
        return cls(resblock="2", upsample_rates=(8, 8, 4),
                   upsample_kernel_sizes=(16, 16, 8),
                   upsample_initial_channel=256,
                   resblock_kernel_sizes=(3, 5, 7),
                   resblock_dilation_sizes=((1, 2), (2, 6), (3, 12)),
                   **kw)

    @property
    def total_upsample(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out


def _wn_conv(features, kernel_size, strides=1, dilation=1, groups=1,
             dtype=None, fold=1):
    """Weight-normalized 1-D conv, SAME padding. ``fold>1`` selects the
    space-to-depth twin (identical params/outputs, folded in/out layout)."""
    return nn.WeightNorm(fastconv.Conv(
        features, (kernel_size,), strides=(strides,),
        kernel_dilation=(dilation,), feature_group_count=groups,
        padding="SAME", dtype=dtype, fold=fold,
    ))


class ResBlock1(nn.Module):
    """MRF residual block, type 1 (reference ``model.py:20-81``):
    3×[LReLU → dilated conv → LReLU → conv] with residuals."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    dtype: Optional[jnp.dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        for d in self.dilation:
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel_size, dilation=d,
                          dtype=self.dtype, fold=self.fold)(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel_size, dtype=self.dtype,
                          fold=self.fold)(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    """MRF residual block, type 2 (reference ``model.py:84-112``)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3)
    dtype: Optional[jnp.dtype] = None
    fold: int = 1

    @nn.compact
    def __call__(self, x):
        for d in self.dilation:
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel_size, dilation=d,
                          dtype=self.dtype, fold=self.fold)(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """mel → waveform (reference ``model.py:115-173``).

    Input [B, T, num_mels] → output [B, T·prod(upsample_rates), 1], tanh.
    """

    config: HiFiGANConfig = HiFiGANConfig()

    @nn.compact
    def __call__(self, x):
        c = self.config
        block = ResBlock1 if c.resblock == "1" else ResBlock2
        num_kernels = len(c.resblock_kernel_sizes)

        x = _wn_conv(c.upsample_initial_channel, 7, dtype=c.dtype)(x)
        # Space-to-depth fold factor for the low-channel tail: once
        # ch*fold*u fits in the 128 vector lanes, the transposed conv
        # *enters* folded layout for free (output fold = u*input fold) and
        # every subsequent conv/elementwise op stays folded — exact same
        # math and params, full MXU tiles (see nn/fastconv.py).
        fold = 1
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            enter_fold = c.folded_convs and ch * fold * u <= 128
            if fold > 1 and not enter_fold:  # pragma: no cover - no config hits this
                x = fastconv.unfold(x, fold)
                fold = 1
            x = nn.WeightNorm(fastconv.ConvTranspose(
                ch, (k,), strides=(u,), padding="SAME",
                transpose_kernel=True, dtype=c.dtype,
                fold=fold if enter_fold else 0,
            ))(x)
            if enter_fold:
                fold *= u
            xs = None
            for kr, dil in zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes):
                out = block(ch, kr, tuple(dil), dtype=c.dtype, fold=fold)(x)
                xs = out if xs is None else xs + out
            x = xs / num_kernels
        x = nn.leaky_relu(x, 0.3)  # final LReLU uses the Keras default slope
        x = _wn_conv(1, 7, dtype=c.dtype, fold=fold)(x)
        return fastconv.unfold(jnp.tanh(x), fold)


class DiscriminatorP(nn.Module):
    """Period discriminator (reference ``model.py:177-246``): reflect-pad to a
    multiple of the period, fold time into 2-D, stacked (5,1)-kernel convs."""

    period: int
    kernel_size: int = 5
    stride: int = 3
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        """x: [B, T, 1] → (score [B, N], fmaps)."""
        B, T, C = x.shape
        if T % self.period != 0:
            n_pad = self.period - (T % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // self.period, self.period, C)

        fmap = []
        for ch, st in ((32, self.stride), (128, self.stride), (512, self.stride),
                       (1024, self.stride), (1024, 1)):
            x = nn.WeightNorm(nn.Conv(
                ch, (self.kernel_size, 1), strides=(st, 1), padding="SAME",
                dtype=self.dtype,
            ))(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.WeightNorm(nn.Conv(1, (3, 1), padding="SAME", dtype=self.dtype))(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """5 period discriminators, periods 2/3/5/7/11
    (reference ``model.py:250-276``)."""

    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, y, y_hat):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p, dtype=self.dtype)
            s_r, f_r = d(y)
            s_g, f_g = d(y_hat)
            y_d_rs.append(s_r); fmap_rs.append(f_r)
            y_d_gs.append(s_g); fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


class DiscriminatorS(nn.Module):
    """Scale discriminator (reference ``model.py:279-351``): grouped 1-D conv
    stack; spectral norm on the raw-scale instance.

    The 41-tap grouped stacks are the GAN step's hot spot: XLA's stock
    feature-grouped TPU lowering runs each group as a ``co/g``-lane sliver
    (profiled 19-80 GB/s), and the ``bgc`` batch-grouped re-lowering gets
    rewritten by XLA into equally slow 4-D forms (round-4 trace: still
    ~43 ms of the 83 ms step at 24-85 GB/s). ``group_impl`` picks the fix:

    - ``"gdot"``: space-to-depth per group in GROUP-OUTERMOST layout
      (``fold_gouter``), each folded conv a group-batched ``dot_general``
      — same lane-filling math as ``"folded"``, but the inter-layer fold
      refinements (L2→L3→L4→L5) become FREE reshapes and XLA emits plain
      batched GEMMs instead of 4096-channel convs with exotic layouts
      (the 26 ms formatting bucket of the round-4 trace, PERF.md).
      SPMD-safe (batch is a free dot dim). Identical params/math.
    - ``"folded"``: space-to-depth per group (``fold_grouped``) so each
      group's contraction AND output fill the 128 lanes; stays
      feature-grouped, so it is SPMD-safe under batch sharding (the thing
      ``bgc`` can never be). Identical params/math.
    - ``"bgc"``: batch_group_count re-lowering (single-device only).
    - ``"stock"``: plain flax grouped convs."""

    use_spectral_norm: bool = False
    dtype: Optional[jnp.dtype] = None
    group_impl: str = "stock"

    # (channels, kernel, stride, groups) — reference model.py:284-320.
    SPECS = ((128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
             (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
             (1024, 5, 1, 1))

    @staticmethod
    def _folded_schedule(specs):
        """Per-layer (Pi, Po) input/output folds for the folded impl, or
        None for unfolded (g=1) layers — planned BACKWARD so that a
        layer's output fold equals the next layer's input fold whenever
        legal, skipping the inter-layer relayout transposes (round-4
        trace: the naive fold/unfold-every-layer version spent 45% of the
        GAN step in data formatting). Legal reuse needs the same group
        count, a full-to-4x-tile output (128 <= Po*co_g <= 512), and
        bounded zero-padding FLOP inflation (K'*Pi/k <= 2.6)."""
        sched = [None] * len(specs)
        nxt_pi = None
        for i in reversed(range(len(specs))):
            ch, k, s, g = specs[i]
            if g == 1:
                nxt_pi = None
                continue
            co_g = ch // g

            def inflation(po):
                pi = s * po
                pl = (k - 1 + 1 - s) // 2
                ms = [(s * r + j - pl) // pi
                      for r in range(po) for j in range(k)]
                return (max(ms) - min(ms) + 1) * pi / k

            po = max(1, 128 // co_g)
            if (nxt_pi is not None and 128 <= nxt_pi * co_g <= 512
                    and inflation(nxt_pi) <= 2.6):
                po = nxt_pi
            elif inflation(po) > 2.6:  # pragma: no cover - no spec hits this
                # Don't emit a degenerate po=1 plan (with stride>1 it would
                # leave a folded array flowing into the next stock conv);
                # just skip folding this layer entirely.
                sched[i] = None
                nxt_pi = None
                continue
            sched[i] = (s * po, po)
            nxt_pi = s * po
            if i > 0 and specs[i - 1][3] != g:
                nxt_pi = None
        return sched

    @nn.compact
    def __call__(self, x, *, update_stats: bool = False):
        def norm(conv):
            if self.use_spectral_norm:
                return nn.SpectralNorm(conv)
            return nn.WeightNorm(conv)

        def apply(conv, xin):
            if self.use_spectral_norm:
                return norm(conv)(xin, update_stats=update_stats)
            return norm(conv)(xin)

        specs = self.SPECS
        # "gdot_pallas" = gdot layout algebra + the fused Pallas tap-window
        # kernel for the per-layer dots (ops/gouter_kernel.py), XLA-dots
        # backward; falls back per-conv to the XLA tap loop off-TPU or on
        # ineligible shapes.
        gout = self.group_impl in ("gdot", "gdot_pallas")
        sched = (self._folded_schedule(specs)
                 if self.group_impl == "folded" or gout
                 else [None] * len(specs))
        # Current storage layout of x: folded by cur_po in group-major
        # cur_g blocks ((1, 1) = plain [B, L, C]); the gdot impl keeps the
        # same (cur_po, cur_g) bookkeeping but stores [g, B, Q, Po*co]
        # (group-OUTERMOST, ``fold_gouter``). Fmaps are appended in
        # whatever layout the layer produced — feature_loss (mean |r-g|)
        # is permutation-invariant, and real/fake pass through identical
        # layouts, so the loss value is unchanged; anything needing
        # spatial order (the next unfolded conv, the caller) gets plain
        # layout restored first.
        cur_po, cur_g, length = 1, 1, x.shape[1]
        fmap = []
        for i, (ch, k, s, g) in enumerate(specs):
            use = sched[i]
            if use and (length % use[0] != 0 or use[0] == 1):
                use = None  # length not foldable at this Pi -> stock
            if use:
                pi, po = use
                if gout:
                    # free reshape at equal g; one transpose on g growth
                    x = fastconv.regroup_gouter(x, cur_po, cur_g, pi, g)
                elif (cur_po, cur_g) != (pi, g):  # relayout on mismatch
                    if cur_po > 1:
                        x = fastconv.unfold_grouped(x, cur_po, cur_g)
                    x = fastconv.fold_grouped(x, pi, g)
                conv = fastconv.Conv(ch, (k,), strides=(s,),
                                     feature_group_count=g, padding="SAME",
                                     dtype=self.dtype, fold=pi,
                                     layout="gouter" if gout else "gmajor",
                                     tap_impl="pallas"
                                     if self.group_impl == "gdot_pallas"
                                     else "xla")
                x = apply(conv, x)
                cur_po, cur_g = po, g
            else:
                if cur_po > 1:
                    x = (fastconv.unfold_gouter(x, cur_po, cur_g) if gout
                         else fastconv.unfold_grouped(x, cur_po, cur_g))
                    cur_po, cur_g = 1, 1
                conv = fastconv.Conv(ch, (k,), strides=(s,),
                                     feature_group_count=g, padding="SAME",
                                     dtype=self.dtype,
                                     group_impl=self.group_impl
                                     if (g > 1 and self.group_impl == "bgc")
                                     else "stock")
                x = apply(conv, x)
            # Unfolded output length, from the actual shape (SAME convs on
            # non-divisible lengths produce ceil(L/s), so L //= s drifts).
            length = (x.shape[2] if x.ndim == 4 else x.shape[1]) * cur_po
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        if cur_po > 1:
            x = (fastconv.unfold_gouter(x, cur_po, cur_g) if gout
                 else fastconv.unfold_grouped(x, cur_po, cur_g))
        post = nn.Conv(1, (3,), padding="SAME", dtype=self.dtype)
        if self.use_spectral_norm:
            x = norm(post)(x, update_stats=update_stats)
        else:
            x = norm(post)(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


class MultiScaleDiscriminator(nn.Module):
    """3 scale discriminators over average-pooled audio
    (reference ``model.py:354-389``)."""

    dtype: Optional[jnp.dtype] = None
    group_impl: str = "stock"

    @nn.compact
    def __call__(self, y, y_hat, *, update_stats: bool = False):
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        for i in range(3):
            if i != 0:
                y = nn.avg_pool(y, (4,), strides=(2,), padding="SAME")
                y_hat = nn.avg_pool(y_hat, (4,), strides=(2,), padding="SAME")
            d = DiscriminatorS(use_spectral_norm=(i == 0), dtype=self.dtype,
                               group_impl=self.group_impl)
            s_r, f_r = d(y, update_stats=update_stats)
            s_g, f_g = d(y_hat, update_stats=update_stats)
            y_d_rs.append(s_r); fmap_rs.append(f_r)
            y_d_gs.append(s_g); fmap_gs.append(f_g)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ------------------------------------------------------------------- losses
# Reference ``HiFiGAN_TF/losses.py:8-44`` (LSGAN + feature matching).

def feature_loss(fmap_r: List[List[jax.Array]], fmap_g) -> jax.Array:
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for r, g in zip(dr, dg):
            loss += jnp.mean(jnp.abs(r - g))
    return loss * 2.0


def discriminator_loss(disc_real, disc_generated):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real, disc_generated):
        r_loss = jnp.mean(jnp.square(1.0 - dr))
        g_loss = jnp.mean(jnp.square(dg))
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean(jnp.square(1.0 - dg))
        gen_losses.append(l)
        loss += l
    return loss, gen_losses
