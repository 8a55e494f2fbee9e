"""Driver entry-point surface: entry() compiles and runs; dryrun_multichip
executes the sharded BGV step + ring-sharded NTT on the 8-device virtual
mesh (the exact path the round driver validates)."""

import sys
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import __graft_entry__ as graft


def test_entry_jits_and_runs():
    fn, args = graft.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    e0, e1 = out
    assert e0.shape == e1.shape
    assert np.asarray(e0).dtype == np.uint32


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
