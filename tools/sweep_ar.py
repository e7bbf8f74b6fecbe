"""Scan-parameter A/B sweep for the AR families on the real chip.

The AR train steps (Tacotron2 teacher-forced decode, Flowtron density
pass) are sequential-scan-bound, so their throughput hinges on scan
``unroll`` and batch width rather than on kernel choice. This sweeps both
and prints one line per point, using the tunnel-safe chain timing from
``bench.py`` (block_until_ready does not block over axon; see PERF.md).

    python -u tools/sweep_ar.py flowtron_train --unroll 1 4 8 --batch 8 32
    python -u tools/sweep_ar.py tacotron2_train --unroll 1 4 8

Results feed the PERF.md A/B tables (VERDICT round-3 items 5/6).
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

FRAMES = {"flowtron_train": 384, "tacotron2_train": 512}  # mel frames/sample


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("what", choices=sorted(FRAMES))
    ap.add_argument("--unroll", type=int, nargs="+", default=[1, 4, 8])
    ap.add_argument("--batch", type=int, nargs="+", default=[None])
    a = ap.parse_args()

    from neuraltexttospeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bench import _bench_chain
    from tools.trace_capture import _steps

    for batch in a.batch:
        for unroll in a.unroll:
            step_once, carry = _steps(a.what, unroll=unroll, batch=batch)
            wall = _bench_chain(step_once, carry)
            b = batch or {"flowtron_train": 8, "tacotron2_train": 64}[a.what]
            print(f"{a.what} batch={b} unroll={unroll}: "
                  f"{wall * 1e3:.1f} ms/step, "
                  f"{b * FRAMES[a.what] / wall:,.0f} mel-frames/s",
                  flush=True)


if __name__ == "__main__":
    main()
