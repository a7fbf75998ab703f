"""Device mesh construction.

The reference organizes ranks as an nprow x npcol MPI process grid
(src/solve_ABglobal.c:307 superlu_gridinit). The TPU equivalent is a named
1-D jax.sharding.Mesh: the solver shards front batches over it ("front")
and the stencil SpMV shards the latitude axis over it ("band" — the 1-D
block-row domain decomposition, the analog of solve_ABdist.c:139-144).
The reference's 2-D grid expresses SuperLU's internal block-cyclic layout;
the multifrontal engine's equivalent second dimension is the front axis of
the tree-top rounds (mf_jax._shard_factors), not a second mesh axis.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_names=("band",)) -> Mesh:
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    if len(axis_names) != 1:
        raise ValueError("1-axis meshes only (front/band sharding)")
    return Mesh(np.array(devs[:n_devices]), axis_names)
