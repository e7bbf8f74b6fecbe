"""Golden regression anchors: every family's committed weights + outputs.

Mirrors the reference's committed-checkpoint methodology
(``/root/reference/DiffWave_TF/diffwave_logs/checkpoints/``, SURVEY §4):
``tools/make_goldens.py`` trained each tiny model a few deterministic steps
and committed the weights (msgpack) and one forward pass's outputs (npz)
under ``tests/fixtures/golden/``. Restoring the weights into freshly-built
modules and recomputing must reproduce the stored outputs at 1e-5 — a
refactor that silently changes numerics (or breaks the parameter-tree
structure, which makes deserialization fail) trips this immediately.

After an *intentional* numerics change: regenerate with
``python tools/make_goldens.py`` and say so in the commit message.
"""

import pathlib
import sys

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from tools.make_goldens import FAMILIES, GOLDEN_DIR


@pytest.mark.parametrize("name", sorted(FAMILIES))
def test_golden_outputs_reproduce(name):
    from flax import serialization

    blob_path = GOLDEN_DIR / f"{name}.msgpack"
    npz_path = GOLDEN_DIR / f"{name}_golden.npz"
    assert blob_path.exists() and npz_path.exists(), (
        f"golden fixtures for {name} missing — run tools/make_goldens.py")

    # building the family gives the template tree (same code path that
    # generated the fixture; train=False skips the fixture-baking steps —
    # they don't change the tree structure, only the values we restore over)
    variables, fwd = FAMILIES[name](train=False)
    restored = serialization.from_bytes(variables, blob_path.read_bytes())

    golden = np.load(npz_path)
    out = fwd(restored)
    assert sorted(out) == sorted(golden.files)
    for k in golden.files:
        np.testing.assert_allclose(
            np.asarray(out[k]), golden[k], atol=1e-5, rtol=1e-5,
            err_msg=f"{name}:{k} diverged from the committed golden")
