"""A/B the Pallas tap-window kernel vs the XLA gdot loop, per MSD layer.

Shapes are the HiFi-GAN MSD's five grouped layers under the shipped
``DiscriminatorS._folded_schedule`` ((Pi,Po) = (8,4),(16,8),(32,8),(8,2),
(2,2)) at the bench GAN-step config (batch 16, segment 8192; scales 1/2
halve/quarter the length). The XLA variant is exactly
``fastconv.Conv._gouter_call``'s tap loop; the Pallas variant is
``ops/gouter_kernel.py``. Chain timing per bench.py (block_until_ready does
not block over the axon tunnel).

    python -u tools/bench_gouter_pallas.py            # all layers, fwd
    python -u tools/bench_gouter_pallas.py --scale 0  # one scale
"""

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# (name, g, ci, co, k, stride, pi, po, L_in) at scale 0 (L0 = 8192 after
# layer0's stride-1 conv; strides 2,2,4,4,1 cut L between layers)
LAYERS = [
    ("L1", 4, 32, 32, 41, 2, 8, 4, 8192),
    ("L2", 16, 8, 16, 41, 2, 16, 8, 4096),
    ("L3", 16, 16, 32, 41, 4, 32, 8, 2048),
    ("L4", 16, 32, 64, 41, 4, 8, 2, 512),
    ("L5", 16, 64, 64, 41, 1, 2, 2, 128),
]
B = 16


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, nargs="*", default=[0, 1, 2])
    ap.add_argument("--dtype", default="bfloat16")
    a = ap.parse_args()

    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from bench import _bench_chain
    from neuraltexttospeech_tpu.nn.fastconv import _plan_folded
    from neuraltexttospeech_tpu.ops.gouter_kernel import (
        gouter_tap_dots_pallas, pallas_eligible,
    )

    dtype = jnp.dtype(a.dtype)
    rng = np.random.default_rng(0)
    print(f"# backend={jax.default_backend()} dtype={dtype}", flush=True)

    totals = {"xla": 0.0, "pallas": 0.0}
    for scale in a.scale:
        for name, g, ci, co, k, st, pi, po, l0 in LAYERS:
            L = l0 // (2 ** scale)
            q = L // pi
            if q < 8:
                continue
            placements, m_min, m_max, s = _plan_folded(k, st, 1, pi, po)
            kf = (m_max - m_min) // s + 1
            X, Y = pi * ci, po * co
            xp = jnp.asarray(
                rng.standard_normal((g, B, q + (kf - 1) * s, X)), dtype)
            wf = jnp.asarray(rng.standard_normal((kf, g, X, Y)), dtype)

            @jax.jit
            def xla_fwd(xp, wf):
                y = None
                for mf in range(kf):
                    sl = jax.lax.slice_in_dim(xp, mf * s, mf * s + q, axis=2)
                    t = jax.lax.dot_general(sl, wf[mf],
                                            (((3,), (1,)), ((0,), (0,))))
                    y = t if y is None else y + t
                return y

            @jax.jit
            def pl_fwd(xp, wf):
                return gouter_tap_dots_pallas(xp, wf, s=s, q=q)

            ok = pallas_eligible(xp.shape, wf.shape, q, dtype)
            y_x = xla_fwd(xp, wf)
            results = {}
            for label, fn in (("xla", xla_fwd),
                              *((("pallas", pl_fwd),) if ok else ())):
                if label == "pallas":
                    err = float(jnp.abs(fn(xp, wf).astype(jnp.float32)
                                        - y_x.astype(jnp.float32)).max())
                else:
                    err = 0.0

                def chain(c, i, fn=fn):
                    out = fn(c, wf)
                    # feed a zero-valued function of the output back into
                    # the input so steps serialize
                    return c + (out.sum() * 0).astype(c.dtype)

                wall = _bench_chain(chain, xp)
                flops = 2 * g * B * kf * q * X * Y
                results[label] = wall
                totals[label] = totals.get(label, 0) + wall
                print(f"scale{scale} {name} g={g} B={B} q={q} X={X} Y={Y} "
                      f"kf={kf}: {label} {wall*1e6:.0f} us, "
                      f"{flops/wall/1e12:.1f} TFLOP/s"
                      + (f", maxdiff {err:.2e}" if label == "pallas" else ""),
                      flush=True)
            if "pallas" in results:
                print(f"  -> speedup {results['xla']/results['pallas']:.2f}x",
                      flush=True)
    print(f"\ntotal fwd: xla {totals['xla']*1e3:.2f} ms, "
          f"pallas {totals.get('pallas', 0)*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
