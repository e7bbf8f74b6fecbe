"""Driver surface: multi-chip dry run executes on the virtual 8-device mesh."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_8(capsys):
    __graft_entry__.dryrun_multichip(8)
    out = capsys.readouterr().out
    # six stages, each with its own OK line: FastPitch dp×tp, DiffWave DP,
    # HiFi-GAN 3-optimizer GAN step DP, Tacotron2 (nn.scan decoder +
    # BatchNorm under SPMD), Grad-TTS (MAS + UNet), Flowtron (AR flows)
    assert out.count(" OK") == 6, out
    for stage in ("diffwave", "hifigan_gan", "tacotron2", "gradtts",
                  "flowtron"):
        assert stage in out, (stage, out)


def test_entry_compiles():
    import jax

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]
