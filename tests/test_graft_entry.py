"""Driver entry points: single-chip compile check + 8-device dryrun.

These are the exact functions the round driver invokes; regressions here
fail the round, so they are guarded in CI.
"""
import jax
import numpy as np
import pytest

import __graft_entry__ as ge


def test_entry_compiles_and_runs():
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    for o in out:
        assert np.isfinite(np.asarray(o)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dryrun_multichip():
    ge.dryrun_multichip(8)
