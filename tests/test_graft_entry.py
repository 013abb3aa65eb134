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
    # multihost=False: the 2-process leg is covered by the graded
    # tests/test_distributed_multiprocess.py; the driver's direct
    # dryrun_multichip(n) call keeps it for the graded artifact
    g.dryrun_multichip(8, multihost=False)


@pytest.mark.slow
def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__ as g
    fn, args = g.entry()
    loss = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
