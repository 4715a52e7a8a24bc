"""Driver contract tests: entry() compiles single-chip; dryrun_multichip
executes on a virtual 8-device CPU mesh."""
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_dryrun_multichip_8dev():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)


@pytest.mark.skipif(
    not __import__("os").environ.get("RUN_SLOW"), reason="slow; set RUN_SLOW=1"
)
def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()
