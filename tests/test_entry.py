"""Driver entry-point smoke tests (single-chip jit + 8-device mesh)."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    state, seg = out
    assert seg.shape == (24, 32)


@pytest.mark.parametrize("n", [2, 8])
def test_dryrun_multichip(n):
    import __graft_entry__ as ge
    ge.dryrun_multichip(n)


def test_mesh_factorization():
    from emfusion_tpu.distributed.mesh import make_mesh
    m = make_mesh(8)
    assert dict(zip(m.axis_names, m.devices.shape)) == {"obj": 4, "z": 2}
    m1 = make_mesh(1)
    assert m1.devices.size == 1
