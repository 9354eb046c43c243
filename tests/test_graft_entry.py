"""Driver-contract tests: __graft_entry__.entry() must stay jittable and
dryrun_multichip must execute on a virtual mesh — breaking either breaks the
external evaluation harness."""

import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = fn(*args)
    jax.block_until_ready(out)
    ema, frames, sync, score = out
    assert ema.shape == (600, 800)
    assert frames.shape[1:] == (600, 800)
    assert np.isfinite(np.asarray(ema)).all()


def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)
