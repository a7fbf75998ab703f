"""Device mesh construction.

The reference organizes ranks as an nprow x npcol MPI process grid
(src/solve_ABglobal.c:307 superlu_gridinit). The TPU equivalent is a named
jax.sharding.Mesh; the latitude ("j") axis of the ocean grid maps onto the
mesh's "band" axis (1-D block-row domain decomposition, the analog of
solve_ABdist.c:139-144), and the RHS batch maps onto "rhs" when two axes
are requested.
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
    devs = np.array(devs[:n_devices])
    if len(axis_names) == 1:
        return Mesh(devs.reshape(-1), axis_names)
    if len(axis_names) == 2:
        # favor the band axis; rhs axis gets the rest
        band = 1
        while band * 2 <= n_devices and band * 2 <= 8:
            band *= 2
        while n_devices % band:
            band //= 2
        return Mesh(devs.reshape(band, n_devices // band), axis_names)
    raise ValueError("1- or 2-axis meshes supported")
