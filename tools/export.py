"""Export a training checkpoint as a single-file inference artifact.

The reference's deployable format was a TF SavedModel per epoch (DiffWave
only, ``DiffWave_TF/train.py:179-192``). Here any model's params export to
one msgpack file (flax serialization) + a JSON config — a self-contained
artifact for serving.

Usage:
  python tools/export.py --model FastPitch \
      --checkpoint out/fastpitch/checkpoints -o fastpitch.msgpack
"""

import argparse
import dataclasses
import json
import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--model", required=True,
                   help="registry name (FastPitch, DiffWave, ...)")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("-o", "--output", required=True)
    args = p.parse_args(argv)

    from flax import serialization

    from neuraltexttospeech_tpu.train.checkpoint import Checkpointer

    ckpt = Checkpointer(args.checkpoint)
    step = ckpt.latest_step()
    if step is None:
        raise SystemExit(f"no checkpoints under {args.checkpoint}")
    # Restore the raw tree (no template needed for export: take params leaf).
    restored = ckpt.manager.restore(step)
    tree = restored if isinstance(restored, dict) else restored.__dict__
    params = tree.get("params", tree)
    # TrainState.params holds the full flax variables dict; unwrap to the
    # module tree so the artifact is the bare parameter pytree.
    while isinstance(params, dict) and set(params) == {"params"}:
        params = params["params"]

    out = pathlib.Path(args.output)
    out.write_bytes(serialization.to_bytes(params))

    from neuraltexttospeech_tpu.models.registry import get_model_config

    cfg = get_model_config(args.model)
    meta = {"model": args.model, "step": int(step),
            "config": dataclasses.asdict(cfg)}
    meta = {k: v for k, v in meta.items()}
    out.with_suffix(".json").write_text(json.dumps(meta, indent=2, default=str))
    print(f"exported {args.model} step {step} → {out} "
          f"({out.stat().st_size/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
