"""Space-to-depth ("folded") 1-D convolutions for low-channel tails.

Why: TPU conv throughput collapses when the channel count is far below the
128-wide vector lanes / MXU contraction dim. Profiling the HiFi-GAN v1
generator (reference ``HiFiGAN_TF/model.py:115-173``) on a v5e showed the
C=32 resblock stage running at 16 TFLOP/s / 150 GB/s — 45% of the whole
step — while the structurally identical C=128 stage ran at ~172 TFLOP/s:
at C=32 only a quarter of the lanes and a quarter of the MXU contraction
are live.

The fix is the classic space-to-depth trick: fold the length axis into
channels, ``[B, L, C] -> [B, L/P, P*C]`` with ``P*C = 128``, and rewrite
the conv as an *exactly equivalent* stride-1 conv in folded space whose
kernel is the original kernel scattered into a block-banded
``[K', P*Cin, P*Cout]`` matrix. Derivation for a stride-1 dilated conv
(SAME, zero pad ``pl = (K-1)*d//2``)::

    out[b, t, co]        = sum_j x[b, t + j*d - pl, ci] * W[j, ci, co]
    t = P*q + r  =>  t + j*d - pl = P*(q + m) + v   (m = floor div, v = mod)
    out_f[b, q, r*Co+co] = sum_m x_f[b, q + m, v*Ci+ci] * W_f[m, ...]

so ``W_f[m - m_min, v*Ci + ci, r*Co + co] = W[j, ci, co]`` for every
``(r, j)`` pair, and the folded conv pads by ``(-m_min, m_max)``. The same
index algebra covers ``flax.linen.ConvTranspose(transpose_kernel=True,
padding="SAME")``: with input fold ``Pi`` and stride ``u`` the output comes
out folded by ``Po = u*Pi`` *from the same folded stride-1 conv*, so a
whole upsampling tail (transposed conv + resblocks + post conv) stays in
folded layout with zero extra transposes.

The modules below subclass ``nn.Conv`` / ``nn.ConvTranspose`` with the
SAME class name, param names, shapes and initializers, so flax
auto-naming, ``nn.WeightNorm`` wrapping, checkpoints, TF-parity weight
transplants and golden fixtures are all unaffected; ``fold=1`` falls back
to the stock implementation. Equivalence (values and gradients) is
asserted in ``tests/test_fastconv.py``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.linen import dtypes as _dtypes

__all__ = ["Conv", "ConvTranspose", "fold", "unfold", "fold_grouped",
           "unfold_grouped", "fold_gouter", "unfold_gouter",
           "regroup_gouter", "gouter_tap_dots"]


import functools


def _tap_dots_any(xp, wf, s: int, q: int):
    """Tap-window sum ``sum_mf xp[.., mf*s+t, :] @ wf[mf]`` — the fused
    Pallas kernel on eligible TPU shapes, else the XLA per-tap loop."""
    from ..ops.gouter_kernel import gouter_tap_dots_pallas, pallas_eligible

    if (jax.default_backend() == "tpu"
            and pallas_eligible(xp.shape, wf.shape, q, xp.dtype)):
        return gouter_tap_dots_pallas(xp, wf, s=s, q=q)
    y = None
    for mf in range(wf.shape[0]):
        sl = jax.lax.slice_in_dim(xp, mf * s, mf * s + q, axis=2)
        t = jax.lax.dot_general(sl, wf[mf], (((3,), (1,)), ((0,), (0,))))
        y = t if y is None else y + t
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gouter_tap_dots(xp, wf, s: int, q: int):
    """``y[g,b,t,:] = sum_mf xp[g,b,mf*s+t,:] @ wf[mf,g,:,:]`` via the
    fused Pallas tap-window kernel (``ops/gouter_kernel.py``). Forward
    avoids the physical-layout copies XLA's layout assignment inserts
    around the per-tap ``dot_general``s (PERF.md round-4/5 gdot traces).

    The input cotangent is the SAME tap-window sum on zero-padded ``dy``
    with flipped+transposed weights (with ``pad = (kf-1)*s``:
    ``dxp[u] = sum_mf' dyp[u + mf'*s] @ wf[kf-1-mf']^T``), so the backward
    reuses the kernel instead of a serialized dynamic-update-slice chain
    (the first custom_vjp draft's DUS backward made the full GAN step
    SLOWER than gdot: 80.5 vs 50.0 ms). The weight cotangent is kf plain
    XLA contractions to the small ``[g, X, Y]`` blocks."""
    return _tap_dots_any(xp, wf, s, q)


def _gouter_tap_dots_fwd(xp, wf, s, q):
    return gouter_tap_dots(xp, wf, s, q), (xp, wf)


def _gouter_tap_dots_bwd(s, q, res, dy):
    xp, wf = res
    kf = wf.shape[0]
    qp = xp.shape[2]
    pad = (kf - 1) * s
    # dxp via the tap-dots identity above; right-pad so the output row
    # count qp rounds to the kernel's 8-sublane tile, then slice back.
    q_pad = (-qp) % 8
    dyp = jnp.pad(dy, ((0, 0), (0, 0), (pad, pad + q_pad), (0, 0)))
    w_rev = jnp.flip(wf, axis=0).transpose(0, 1, 3, 2)  # [kf, g, Y, X]
    dxp = _tap_dots_any(dyp, w_rev, s, qp + q_pad)[:, :, :qp, :]
    # dwf[mf] = sum_{b,t} xp_window^T dy -> [g, X, Y] (small outputs; XLA)
    dwf = []
    for mf in range(kf):
        sl = jax.lax.slice_in_dim(xp, mf * s, mf * s + q, axis=2)
        dwf.append(jax.lax.dot_general(
            sl, dy, (((1, 2), (1, 2)), ((0,), (0,)))))
    return dxp.astype(xp.dtype), jnp.stack(dwf).astype(wf.dtype)


gouter_tap_dots.defvjp(_gouter_tap_dots_fwd, _gouter_tap_dots_bwd)


def fold(x: jax.Array, p: int) -> jax.Array:
    """[B, L, C] -> [B, L//p, p*C] (pure reshape; positions interleave into
    channel blocks of C)."""
    if p == 1:
        return x
    b, l, c = x.shape
    return x.reshape(b, l // p, p * c)


def unfold(x: jax.Array, p: int) -> jax.Array:
    """Inverse of :func:`fold`."""
    if p == 1:
        return x
    b, q, pc = x.shape
    return x.reshape(b, q * p, pc // p)


def fold_gouter(x: jax.Array, p: int, g: int) -> jax.Array:
    """[B, L, g*ci] -> [g, B, L//p, p*ci] GROUP-OUTERMOST folded layout.

    The ``gouter`` layout hoists the group index to its own leading dim so
    the grouped folded conv can run as a group-batched ``dot_general``
    instead of a ``feature_group_count`` conv. The payoff is inter-layer
    layout algebra: merging A consecutive folded rows (fold refinement
    ``po -> A*po`` between layers with the same group count) is a FREE
    reshape ``[g, B, Q, X] -> [g, B, Q/A, A*X]``, where the group-major
    3-D layout needs a cross-group transpose (the 26 ms "data formatting"
    bucket of the round-4 GAN-step trace, PERF.md)."""
    b, l, c = x.shape
    ci = c // g
    return (x.reshape(b, l // p, p, g, ci).transpose(3, 0, 1, 2, 4)
            .reshape(g, b, l // p, p * ci))


def unfold_gouter(x: jax.Array, p: int, g: int) -> jax.Array:
    """Inverse of :func:`fold_gouter`: [g, B, Q, p*co] -> [B, Q*p, g*co]."""
    g_, b, q, pc = x.shape
    co = pc // p
    return (x.reshape(g, b, q, p, co).transpose(1, 2, 3, 0, 4)
            .reshape(b, q * p, g * co))


def regroup_gouter(x: jax.Array, cur_po: int, cur_g: int,
                   pi: int, g: int) -> jax.Array:
    """Relayout to the gouter input of the next folded grouped conv.

    ``x`` is either plain 3-D ``[B, L, g*ci]`` or the previous layer's
    gouter output ``[cur_g, B, Q, cur_po*co]``; returns
    ``[g, B, Q', pi*ci]``. The whole point of the gouter layout: at equal
    group count a fold refinement ``cur_po -> pi = A*cur_po`` is a FREE
    reshape (A consecutive folded rows merge in place), and a group
    refinement ``cur_g -> g = F*cur_g`` needs only one transpose hoisting
    the F sub-group bits out of the channel dim (position-major merge
    ``v' = a*cur_po + r`` comes out right because ``a`` is row-major above
    ``r``). Everything else falls back through plain layout."""
    if x.ndim == 3:
        return fold_gouter(x, pi, g)
    gg, b, qc, pc = x.shape
    co = pc // cur_po
    if g == cur_g and pi % cur_po == 0 and qc % (pi // cur_po) == 0:
        a = pi // cur_po
        return x if a == 1 else x.reshape(gg, b, qc // a, a * pc)
    f = g // cur_g if g % cur_g == 0 else 0
    if (f > 1 and pi % cur_po == 0 and co % f == 0
            and qc % (pi // cur_po) == 0):
        a = pi // cur_po
        ci = co // f
        x = x.reshape(gg, b, qc // a, a, cur_po, f, ci)
        return (x.transpose(0, 5, 1, 2, 3, 4, 6)
                .reshape(g, b, qc // a, pi * ci))
    return fold_gouter(unfold_gouter(x, cur_po, cur_g), pi, g)


def _plan_folded(k: int, st: int, d: int, p: int, po: int):
    """Folded-tap placement plan shared by the gmajor and gouter paths.

    Returns (placements, m_min, m_max, s): each (m, v, r, j) places
    original tap j into folded tap row m at in-position v for out-position
    r; s is the gcd stride over m so dilated original kernels stay k taps
    folded (emitted as rhs_dilation / strided slices) instead of
    densifying."""
    # flax SAME padding for stride st (L % st == 0, guaranteed by the
    # fold): pad_total = (k-1)*d + 1 - st, pad_left = pad_total // 2
    # (lax.padtype_to_pads). st=1 reduces to the classic ((k-1)*d)//2.
    # XLA clamps pad_total to 0 when the kernel span is smaller than the
    # stride; the formula below would go negative and silently shift every
    # tap — no current model has k < stride, so fail loudly instead.
    if (k - 1) * d + 1 < st:
        raise NotImplementedError(
            f"folded path: kernel span (k-1)*d+1={(k - 1) * d + 1} < "
            f"stride {st} (XLA SAME clamps pad_total to 0 here); use the "
            "stock conv for this layer")
    pl = ((k - 1) * d + 1 - st) // 2
    placements = []
    for r in range(po):
        for j in range(k):
            val = st * r + j * d - pl
            m = val // p
            placements.append((m, val - m * p, r, j))
    m_min = min(pm[0] for pm in placements)
    m_max = max(pm[0] for pm in placements)
    s = 0
    for m, _, _, _ in placements:
        s = int(np.gcd(s, m - m_min))
    s = max(s, 1)
    return placements, m_min, m_max, s


def _scatter_folded(kernel_taps, placements, k_folded, ci, co, p_in, p_out,
                    groups: int = 1):
    """Build W_f [k_folded, p_in*ci, groups*p_out*co] from per-tap blocks.

    ``kernel_taps`` is [k, ci, groups*co]; ``placements`` is a list of
    (m, v, r, tap_index); group γ's tap j lands at
    ``W_f[m, v*ci:(v+1)*ci, γ, r*co:(r+1)*co]``. Distinct (r, tap) pairs
    map to distinct (m, v, r) slots (the index map is injective in j for
    fixed r), so each output slot receives at most one tap and the one-hot
    contraction below is exact (0/1 weights, no true summation). One
    einsum replaces the earlier per-placement ``.at[].set`` chain — up to
    ~160 serialized dynamic-update-slices per conv on the large grouped
    kernels, executed at every apply.
    """
    k = kernel_taps.shape[0]
    taps = kernel_taps.reshape(k, ci, groups, co)
    sel = np.zeros((k_folded, p_in, p_out, k), np.float32)
    for m, v, r, j in placements:
        sel[m, v, r, j] = 1.0
    sel = jnp.asarray(sel, taps.dtype)
    wf = jnp.einsum("mvrj,jigo->mvigro", sel, taps)
    return wf.reshape(k_folded, p_in * ci, groups * p_out * co)


def fold_grouped(x: jax.Array, p: int, g: int) -> jax.Array:
    """[B, L, g*ci] -> [B, L//p, g*p*ci] in GROUP-MAJOR folded layout.

    Folding a grouped conv's input position-major (:func:`fold`) would
    interleave the groups across the folded channel dim, but
    ``feature_group_count`` needs each group's channels contiguous — so the
    grouped folded layout puts the group index outermost:
    ``x_f[..., γ*(p*ci) + r*ci + i] = x[..., L-pos r, γ*ci + i]``.
    ``g=1`` reduces to :func:`fold`.
    """
    if p == 1:
        return x
    b, l, c = x.shape
    ci = c // g
    return (x.reshape(b, l // p, p, g, ci).transpose(0, 1, 3, 2, 4)
            .reshape(b, l // p, g * p * ci))


def unfold_grouped(x: jax.Array, p: int, g: int) -> jax.Array:
    """Inverse of :func:`fold_grouped`."""
    if p == 1:
        return x
    b, q, c = x.shape
    ci = c // (g * p)
    return (x.reshape(b, q, g, p, ci).transpose(0, 1, 3, 2, 4)
            .reshape(b, q * p, g * ci))


class Conv(nn.Conv):
    """``nn.Conv`` twin that computes a SAME conv in folded space.

    With ``fold=P>1`` the input is a folded ``[B, L/P, P*C]`` array and the
    output comes out folded by ``P/stride`` (same folded length; ``fold``
    must be divisible by ``stride``); ``fold=1`` is byte-for-byte
    ``nn.Conv``. Param tree (names, shapes, inits) is identical either way.

    Grouped convs (``feature_group_count=g>1``) fold too: the folded input
    must be in GROUP-MAJOR layout (:func:`fold_grouped`) so each group's
    ``P*ci`` channels stay contiguous, and the output is group-major folded
    by ``P/stride``. This keeps the conv feature-grouped — each group
    becomes a full-128-lane tile instead of a ``co/g``-lane sliver, and
    unlike the ``bgc`` lowering it is SPMD-safe under batch sharding.

    ``group_impl="bgc"`` re-lowers a grouped conv (feature_group_count>1)
    through ``batch_group_count`` instead: groups move from the feature dim
    into the batch dim, so the kernel's output-feature dim stays the FULL
    ``features`` wide (128-lane tiles) instead of ``features/G``. XLA's TPU
    lowering of feature-grouped convs tiles each group separately — profiled
    at 19-80 GB/s / ~3% MXU on the HiFi-GAN MSD's 41-tap grouped stacks
    (reference ``HiFiGAN_TF/model.py:279-351``) — while the batch-grouped
    form is the same lowering XLA uses for conv *weight gradients*, which is
    tiled properly. Same params, same math (≤ f32-reduction-order; asserted
    in tests/test_fastconv.py).
    """

    fold: int = 1
    group_impl: str = "stock"  # "stock" | "bgc" (grouped convs only)
    layout: str = "gmajor"  # "gmajor" (3-D folded) | "gouter" ([g,B,Q,P*ci])
    # "xla": per-tap dot_generals; "pallas": the fused tap-window kernel
    # (ops/gouter_kernel.py) on eligible shapes, XLA-dots backward —
    # falls back to "xla" off-TPU or on ineligible shapes.
    tap_impl: str = "xla"

    @nn.compact
    def __call__(self, x):
        if self.group_impl not in ("stock", "bgc"):
            raise ValueError(
                f"group_impl must be 'stock' or 'bgc', got "
                f"{self.group_impl!r}")
        if self.layout not in ("gmajor", "gouter"):
            raise ValueError(
                f"layout must be 'gmajor' or 'gouter', got {self.layout!r}")
        p = self.fold
        if p > 1 and self.group_impl == "bgc":
            raise ValueError("fold>1 and group_impl='bgc' are exclusive — "
                             "the folded path is already group-aware")
        if self.layout == "gouter":
            if p <= 1:
                raise ValueError("layout='gouter' requires fold>1")
            if self.padding != "SAME":
                raise NotImplementedError("gouter path: SAME only")
            return self._gouter_call(x)
        if (p == 1 and self.feature_group_count > 1
                and self.group_impl == "bgc"):
            return self._bgc_call(x)
        if p == 1:
            return super().__call__(x)
        if self.padding != "SAME":
            raise NotImplementedError("folded path: SAME only")
        g = self.feature_group_count
        (k,) = self.kernel_size
        strides = self.strides or 1
        (st,) = strides if isinstance(strides, (tuple, list)) else (strides,)
        if p % st != 0:
            raise NotImplementedError(
                f"folded path: fold ({p}) must be divisible by stride ({st})")
        po = p // st  # output fold: Q stays constant, L_out = L/st = Q*po
        dil = self.kernel_dilation or 1
        (d,) = dil if isinstance(dil, (tuple, list)) else (dil,)

        if x.ndim != 3 or x.shape[-1] % (p * g) != 0:
            raise ValueError(
                f"folded path expects fold_grouped layout [B, Q, P·g·ci] "
                f"with channels divisible by p·g={p * g}; got {x.shape}")
        ci = x.shape[-1] // (p * g)
        co = self.features // g
        kernel = self.param("kernel", self.kernel_init,
                            (k, ci, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)

        # When the taps' folded positions share a stride (e.g. DiffWave's
        # d % p == 0 dilations: taps at m ∈ {-d/p, 0, d/p}), _plan_folded
        # reports gcd stride s and the folded conv stays k taps for any
        # dilation (emitted as rhs_dilation) instead of growing (k-1)·d/p.
        placements, m_min, m_max, s = _plan_folded(k, st, d, p, po)
        wf = _scatter_folded(
            kernel,
            [((m - m_min) // s, v, r, j) for m, v, r, j in placements],
            (m_max - m_min) // s + 1, ci, co, p, po, groups=g)
        y = jax.lax.conv_general_dilated(
            x, wf, (1,), ((-m_min, m_max),), rhs_dilation=(s,),
            feature_group_count=g,
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=self.precision)
        if bias is not None:
            bias_f = (jnp.tile(bias, po) if g == 1 else
                      jnp.broadcast_to(bias.reshape(g, 1, co),
                                       (g, po, co)).reshape(-1))
            y = y + bias_f
        return y


    def _gouter_call(self, x):
        """Folded grouped conv as a group-batched ``dot_general`` on
        GROUP-OUTERMOST activations.

        Input ``[g, B, Q, Pi*ci]`` (:func:`fold_gouter` layout), output
        ``[g, B, Q, Po*co]`` with ``Po = Pi/stride`` — same index algebra
        as the gmajor folded conv (class docstring), but each folded tap is
        one batched matmul ``[g](B*Q x Pi*ci x Po*co)`` instead of a
        ``feature_group_count`` conv. Two structural wins over gmajor,
        both measured on the round-4 GAN-step trace (PERF.md):

        - XLA lowers plain batched GEMMs without the exotic spatial-minor
          conv layouts that surrounded the 4096-channel folded convs with
          83-257 GB/s layout copies (the 26 ms formatting bucket);
        - with the group dim outermost, an inter-layer fold refinement
          ``po -> A*po`` at equal group count is a free reshape, so the
          whole L2..L5 chain of ``DiscriminatorS`` shares storage with
          ZERO relayout ops.

        SPMD-safe: the batch dim B is a free lhs dim of the dot_general —
        sharding it is ordinary batched-matmul partitioning (unlike
        ``batch_group_count`` convs, which abort the SPMD partitioner).

        Same param tree as ``nn.Conv`` (kernel ``[k, ci, features]``),
        values equal to stock up to f32-reduction order (asserted in
        tests/test_fastconv.py)."""
        p = self.fold
        g = self.feature_group_count
        (k,) = self.kernel_size
        strides = self.strides or 1
        (st,) = strides if isinstance(strides, (tuple, list)) else (strides,)
        if p % st != 0:
            raise NotImplementedError(
                f"gouter path: fold ({p}) must be divisible by stride ({st})")
        po = p // st
        dil = self.kernel_dilation or 1
        (d,) = dil if isinstance(dil, (tuple, list)) else (dil,)
        if x.ndim != 4 or x.shape[0] != g:
            raise ValueError(
                f"gouter input must be [g={g}, B, Q, Pi*ci], got {x.shape}")
        if (self.input_dilation not in (None, 1, (1,))
                or self.mask is not None):
            raise NotImplementedError(
                "gouter path: input_dilation and mask unsupported")
        ci = x.shape[-1] // p
        co = self.features // g
        kernel = self.param("kernel", self.kernel_init,
                            (k, ci, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
        placements, m_min, m_max, s = _plan_folded(k, st, d, p, po)
        kf = (m_max - m_min) // s + 1
        # Folded kernel in per-group-tap arrangement [kf, g, Pi*ci, Po*co]
        # via the same one-hot einsum as _scatter_folded (an .at[].set
        # chain serializes ~160 dynamic-update-slices per apply — measured
        # slower than stock, see PERF.md).
        taps = kernel.reshape(k, ci, g, co)
        sel = np.zeros((kf, p, po, k), np.float32)
        for m, v, r, j in placements:
            sel[(m - m_min) // s, v, r, j] = 1.0
        sel = jnp.asarray(sel, taps.dtype)
        wf = (jnp.einsum("mvrj,jigo->mgviro", sel, taps)
              .reshape(kf, g, p * ci, po * co))
        q = x.shape[2]
        xp = jnp.pad(x, ((0, 0), (0, 0), (-m_min, m_max), (0, 0)))
        if self.tap_impl not in ("xla", "pallas"):
            raise ValueError(
                f"tap_impl must be 'xla' or 'pallas', got {self.tap_impl!r}")
        if self.tap_impl == "pallas":
            # custom_vjp tap-dots: Pallas kernel on eligible TPU shapes
            # (falls back to the XLA loop inside otherwise)
            y = gouter_tap_dots(xp, wf, s, q)
        else:
            y = None
            for mf in range(kf):
                sl = jax.lax.slice_in_dim(xp, mf * s, mf * s + q, axis=2)
                t = jax.lax.dot_general(
                    sl, wf[mf], (((3,), (1,)), ((0,), (0,))),
                    precision=self.precision)
                y = t if y is None else y + t
        if bias is not None:
            y = y + (jnp.broadcast_to(bias.reshape(g, 1, co), (g, po, co))
                     .reshape(g, 1, 1, po * co))
        return y

    def _bgc_call(self, x):
        """Grouped conv via ``batch_group_count`` (see class docstring).

        out[b, t, g*co+j] = sum_{k, i} x[b, t*s + k*d - pad, g*ci+i]
                            * W[k, i, g*co+j]
        — identical contraction to the feature-grouped form; only the dim
        XLA partitions over changes (batch instead of features).

        NOTE: under SPMD with the batch dim sharded, XLA's conv partitioner
        cannot split ``batch_group_count`` convs (aborts in
        ``convolution_handler.cc``) — callers must select ``stock`` when the
        input is batch-sharded (see
        ``models/hifigan_gan.py::resolve_msd_group_impl``).
        """
        if self.input_dilation not in (None, 1, (1,)) or self.mask is not None:
            raise NotImplementedError(
                "bgc path: input_dilation and mask unsupported")
        (k,) = self.kernel_size
        strides = self.strides or 1
        (s,) = strides if isinstance(strides, (tuple, list)) else (strides,)
        dil = self.kernel_dilation or 1
        (d,) = dil if isinstance(dil, (tuple, list)) else (dil,)
        g = self.feature_group_count
        ci = x.shape[-1] // g
        kernel = self.param("kernel", self.kernel_init,
                            (k, ci, self.features), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)
        b, l, _ = x.shape
        # [B, L, G*ci] -> [G*B, L, ci]: batch-group index is MAJOR in lhs
        # batch, matching batch_group_count's output-feature group order.
        xg = x.reshape(b, l, g, ci).transpose(2, 0, 1, 3).reshape(g * b, l, ci)
        y = jax.lax.conv_general_dilated(
            xg, kernel, (s,), self.padding, rhs_dilation=(d,),
            batch_group_count=g,
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=self.precision)
        if bias is not None:
            y = y + bias
        return y


class ConvTranspose(nn.ConvTranspose):
    """``nn.ConvTranspose(transpose_kernel=True, padding="SAME")`` twin.

    With ``fold=Pi >= 1`` the input is folded by ``Pi`` (``Pi=1`` means a
    plain unfolded input) and the output comes out folded by
    ``Po = stride*Pi`` at the SAME folded length, computed as one stride-1
    folded conv — this is how an upsampling stage *enters* folded layout
    for free. ``fold=0`` (default) is byte-for-byte ``nn.ConvTranspose``.

    flax semantics reproduced (verified in tests/test_fastconv.py):
    ``out[t] = sum_m x[m] * Wt[k-1-j, co, ci]`` with ``j = u*m - t + pad_a``
    and SAME ``pad_a = k-1 if u > k-1 else ceil((k+u-2)/2)`` (jax
    ``lax._conv_transpose_padding``).
    """

    fold: int = 0  # 0 = stock nn.ConvTranspose; >=1 = folded in/out

    @nn.compact
    def __call__(self, x):
        pi = self.fold
        if pi == 0:
            return super().__call__(x)
        if not self.transpose_kernel or self.padding != "SAME":
            raise NotImplementedError(
                "folded path: transpose_kernel=True, SAME only")
        (k,) = self.kernel_size
        (u,) = (self.strides if isinstance(self.strides, (tuple, list))
                else (self.strides,))
        po = u * pi

        ci = x.shape[-1] // pi
        # transpose_kernel=True kernel layout: [k, out_features, in_features]
        kernel = self.param("kernel", self.kernel_init,
                            (k, self.features, ci), self.param_dtype)
        bias = (self.param("bias", self.bias_init, (self.features,),
                           self.param_dtype) if self.use_bias else None)
        x, kernel, bias = _dtypes.promote_dtype(x, kernel, bias,
                                                dtype=self.dtype)

        pad_len = k + u - 2
        pad_a = k - 1 if u > k - 1 else int(np.ceil(pad_len / 2))
        # out[Po*q + r] += x[Pi*(q+m) + v] * W[k-1-j, co, ci]
        # with j = u*(Pi*(q+m)+v) - (Po*q+r) + pad_a = u*Pi*m + u*v - r + pad_a
        placements = []
        span = (k + po + u * pi) // (u * pi) + 2
        for r in range(po):
            for v in range(pi):
                for m in range(-span, span + 1):
                    j = u * pi * m + u * v - r + pad_a
                    if 0 <= j < k:
                        placements.append((m, v, r, k - 1 - j))
        m_min = min(pm[0] for pm in placements)
        m_max = max(pm[0] for pm in placements)
        # taps are [co, ci] blocks -> transpose to [ci, co] for WIO layout
        taps = jnp.swapaxes(kernel, 1, 2)
        wf = _scatter_folded(
            taps, [(m - m_min, v, r, j) for m, v, r, j in placements],
            m_max - m_min + 1, ci, self.features, pi, po)
        y = jax.lax.conv_general_dilated(
            x, wf, (1,), ((-m_min, m_max),),
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=self.precision)
        if bias is not None:
            y = y + jnp.tile(bias, po)
        return y
