"""The driver's graded entry points stay runnable.

dryrun_multichip takes the INLINE path here (conftest initializes an
8-device CPU backend); its subprocess re-exec path is exercised manually
and by the driver.  entry() compiles the full-size flagship forward —
slow tier on CPU.
"""

import numpy as np
import pytest


def test_dryrun_multichip_inline():
    import __graft_entry__ as g
    g.dryrun_multichip(8)        # asserts finite loss + step==1 inside


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g
    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
