"""Driver entry points compile and run."""

import numpy as np


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (args[0].shape[0], args[1].shape[1])
    assert out.dtype == np.uint32


def test_dryrun_multichip_8():
    import jax

    import __graft_entry__ as g

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    g.dryrun_multichip(8)
