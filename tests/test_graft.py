"""Driver-contract sanity: entry() shape contract + tiny-config dryrun."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_entry_returns_fn_and_args():
    import __graft_entry__ as g
    fn, args = g.entry()
    assert callable(fn)
    params = args[0]
    assert set(params) == {"acoustic", "refiner", "gst", "generator"}
    # arg shapes follow the contract
    assert args[1].ndim == 3 and args[2].shape[-1] == 18
    assert args[5].dtype == jnp.int32


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 devices")
def test_dryrun_multichip_smoke():
    import __graft_entry__ as g
    g.dryrun_multichip(4)  # 4 of the 8 virtual devices keeps CI fast
