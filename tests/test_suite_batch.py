"""Mixed-family scenario batches (bucketed by problem)."""

import jax.numpy as jnp
import numpy as np

from enlsip_tpu.core.types import Options, Tols
from enlsip_tpu.parallel import batch_mesh
from enlsip_tpu.parallel.suite import hs_scenario_batch, solve_suite_batched


def _tols(dtype):
    eps = float(jnp.finfo(dtype).eps)
    rel = float(np.sqrt(eps))
    return Tols(*(jnp.asarray(v, dtype) for v in (1e-10, rel, rel, rel, rel)))


NAMES = ["hs65", "hs28", "hs48", "hs51"]


def test_mixed_suite_batched():
    fams = hs_scenario_batch(NAMES, per_family=4, seed=1, scale=0.05)
    results = solve_suite_batched(fams, Options(), _tols,
                                  dtype=jnp.float64)
    for name in NAMES:
        res = results[name]
        fstar = fams[name].fstar
        ok = np.asarray(res.exit_code) > 0
        match = np.abs(np.asarray(res.f) - fstar) <= 1e-4 * (1 + abs(fstar))
        assert (ok & match).mean() >= 0.75, (name, res.exit_code, res.f)


def test_mixed_suite_sharded(eight_devices):
    fams = hs_scenario_batch(["hs65", "hs48"], per_family=8, seed=2,
                             scale=0.05)
    mesh = batch_mesh(eight_devices)
    results = solve_suite_batched(fams, Options(), _tols, mesh=mesh,
                                  dtype=jnp.float64)
    for name, res in results.items():
        fstar = fams[name].fstar
        match = np.abs(np.asarray(res.f) - fstar) <= 1e-4 * (1 + abs(fstar))
        assert match.mean() >= 0.75, (name, res.f)
