"""Driver-hook regression tests.

The driver calls ``__graft_entry__.entry()`` (single-chip compile check)
and ``dryrun_multichip(n)`` (full sharded train step on a virtual mesh).
These hooks sit outside the package, so an API drift inside svtpu (e.g.
the round-3 ``temp_floor`` argument added to the jitted train step) can
break them without any package test noticing — this file pins them.
"""
import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __graft_entry__ import _dryrun_body, entry  # noqa: E402


def test_entry_traces():
    # eval_shape = the driver's compile check without paying for a real
    # 256^2 CPU forward.
    fn, args = entry()
    out = jax.eval_shape(fn, *args)
    x_recon, z_seq = out
    assert x_recon.shape[-3:] == (256, 256, 3)
    assert z_seq.shape[:2] == (4, 6) and z_seq.shape[-1] == 50


def test_dryrun_body_toy_geometry():
    # The exact code path the driver runs (mesh build, TP/DP sharding,
    # one train step), at the fast 32x32 geometry. The flagship-geometry
    # variant is exercised by the driver itself (and by
    # `python __graft_entry__.py`).
    _dryrun_body(8, geometry="toy")
