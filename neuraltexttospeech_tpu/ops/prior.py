"""Beta-binomial attention prior computed ON DEVICE from the length vectors.

The host pipeline (``data/prior.py``, reference
``FastPitch_TF/data_function.py:49-91``) precomputes each item's
``[T_mel, T_text]`` prior with scipy and ships it with the batch. That
matrix is pure bookkeeping — a deterministic function of the two integer
lengths — yet it is the batch's largest tensor: 5.5 of 9.5 MB at
16×896×144, i.e. most of the host→device transfer the training loop pays
per step (measured ~5–27 MB/s over this container's remote-TPU tunnel;
PERF.md round-5 host-fed table). Recomputing it inside the jitted step
from ``mel_lens``/``input_lens`` costs ~a megaflop of ``gammaln`` math on
the VPU and removes the bytes entirely.

    pmf(k; n, a, b) = C(n, k) · B(k+a, n−k+b) / B(a, b)

with per-row ``a = s·i``, ``b = s·(M+1−i)`` for mel frame ``i ∈ [1, M]``,
``n = P`` (text length), evaluated at ``k ∈ [0, P)`` — exactly
``data/prior.py::beta_binomial_prior_distribution`` (scipy oracle, diffed
in ``tests/test_misc.py``). Rows ``i > M`` and columns ``k ≥ P`` are 0,
matching the host collate's zero padding.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax.scipy.special import gammaln

__all__ = ["beta_binomial_prior"]


def beta_binomial_prior(mel_lens, text_lens, mel_max: int, text_max: int,
                        scaling_factor: float = 1.0) -> jnp.ndarray:
    """[B, mel_max, text_max] padded beta-binomial priors, on device.

    ``mel_lens``/``text_lens``: int vectors [B]. f32 ``gammaln`` keeps the
    whole computation TPU-native; absolute error vs the f64 scipy oracle
    is ≤2e-3 on LJSpeech-scale shapes (asserted in tests; ~0.5% of the
    pmf peak) — well inside the prior's own modeling slack (the reference
    ships a zoom-interpolated approximation of the same matrix,
    ``data_function.py:49-77``, and the consumer adds it as
    ``log(prior + 1e-8)`` to pre-softmax attention scores).
    """
    i = jnp.arange(1, mel_max + 1, dtype=jnp.float32)[None, :, None]
    k = jnp.arange(text_max, dtype=jnp.float32)[None, None, :]
    m = mel_lens.astype(jnp.float32)[:, None, None]
    n = text_lens.astype(jnp.float32)[:, None, None]
    valid = (i <= m) & (k < n)
    a = scaling_factor * i
    b = jnp.where(valid, scaling_factor * (m + 1.0 - i), 1.0)
    nk = jnp.where(valid, n - k, 1.0)  # n-k >= 1 where valid
    log_pmf = (
        gammaln(n + 1.0) - gammaln(k + 1.0) - gammaln(nk + 1.0)
        + gammaln(k + a) + gammaln(nk + b) - gammaln(n + a + b)
        - (gammaln(a) + gammaln(b) - gammaln(a + b))
    )
    return jnp.where(valid, jnp.exp(log_pmf), 0.0)
