"""Driver contract: entry() jit-compiles and dryrun_multichip runs on the
8-device CPU mesh."""

import jax
import numpy as np


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    img, alpha = jax.block_until_ready(out)
    assert img.shape[-1] == 3
    assert np.isfinite(np.asarray(img)).all()


def test_dryrun_multichip():
    import __graft_entry__ as ge

    # the driver runs the full 100k/256x256 shape; the suite
    # exercises the same code path at a lighter shape
    ge.dryrun_multichip(min(8, jax.device_count()),
                        n_gauss=20_000, wh=(128, 96))
