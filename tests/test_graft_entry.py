"""Driver surface: multi-chip dry run executes on the virtual 8-device mesh."""

import sys
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles():
    import jax

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == args[1].shape[0]
