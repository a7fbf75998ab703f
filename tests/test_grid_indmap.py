"""Grid loading / KMU / index-map tests against straightforward loop oracles."""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu.grid import (
    gen_ind_maps,
    load_grid,
)
from nk_ocn_tracer_jacobian_precond_tpu.grid.grid import derive_kmu
from nk_ocn_tracer_jacobian_precond_tpu.testdata import (
    make_circ_file,
    make_region_file,
)


def kmu_oracle(KMT):
    """Literal translation of the reference loop (src/grid.c:187-198)."""
    jmt, imt = KMT.shape
    KMU = np.zeros_like(KMT)
    for j in range(jmt - 1):
        for i in range(imt):
            ip1 = i + 1 if i < imt - 1 else 0
            KMU[j, i] = min(KMT[j, i], KMT[j + 1, i], KMT[j, ip1], KMT[j + 1, ip1])
    return KMU


def indmap_oracle(KMT, km):
    jmt, imt = KMT.shape
    int3 = -np.ones((km, jmt, imt), dtype=np.int64)
    triples = []
    ind = 0
    for j in range(jmt):
        for i in range(imt):
            for k in range(km):
                if k < KMT[j, i]:
                    int3[k, j, i] = ind
                    triples.append((i, j, k))
                    ind += 1
    return int3, np.array(triples)


@pytest.mark.parametrize("seed", [0, 3])
def test_kmu_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    KMT = rng.integers(0, 6, size=(10, 14))
    KMT[0] = KMT[-1] = 0
    np.testing.assert_array_equal(derive_kmu(KMT), kmu_oracle(KMT))


@pytest.mark.parametrize("seed", [0, 5])
def test_ind_maps_match_oracle(seed):
    rng = np.random.default_rng(seed)
    km = 4
    KMT = rng.integers(0, km + 1, size=(8, 10))
    KMT[0] = KMT[-1] = 0
    maps = gen_ind_maps(KMT, km)
    int3, triples = indmap_oracle(KMT, km)
    assert maps.tracer_state_len == len(triples)
    np.testing.assert_array_equal(maps.int3_to_ind, int3)
    np.testing.assert_array_equal(maps.ind_to_i, triples[:, 0])
    np.testing.assert_array_equal(maps.ind_to_j, triples[:, 1])
    np.testing.assert_array_equal(maps.ind_to_k, triples[:, 2])


def test_flatten_unflatten_roundtrip():
    rng = np.random.default_rng(2)
    km = 5
    KMT = rng.integers(0, km + 1, size=(7, 9))
    KMT[0] = KMT[-1] = 0
    maps = gen_ind_maps(KMT, km)
    field = rng.standard_normal((km, 7, 9))
    flat = maps.flatten_field(field)
    assert flat.shape == (maps.tracer_state_len,)
    restored = maps.unflatten_into(field * 0 + 99.0, flat)
    wet = np.arange(km)[:, None, None] < KMT
    np.testing.assert_array_equal(restored[wet], field[wet])
    assert (restored[~wet] == 99.0).all()


def test_load_grid_from_file(tmp_path):
    circ = str(tmp_path / "circ.nc")
    raw = make_circ_file(circ, imt=12, jmt=10, km=4, seed=1)
    g = load_grid(circ)
    assert (g.imt, g.jmt, g.km) == (12, 10, 4)
    np.testing.assert_array_equal(g.KMT, raw["KMT"])
    np.testing.assert_array_equal(g.KMU, kmu_oracle(raw["KMT"]))
    np.testing.assert_allclose(g.TAREA, raw["TAREA"])
    np.testing.assert_allclose(g.dz, raw["dz"])


def test_load_grid_with_region_mask(tmp_path):
    circ = str(tmp_path / "circ.nc")
    reg = str(tmp_path / "reg.nc")
    raw = make_circ_file(circ, imt=12, jmt=10, km=4, seed=1)
    mask = make_region_file(reg, imt=12, jmt=10, seed=1, ignore_frac=0.3)
    g = load_grid(circ, reg)
    expect = raw["KMT"].copy()
    expect[1:-1][mask[1:-1] < 0] = 0
    np.testing.assert_array_equal(g.KMT, expect)


def test_load_grid_time_dim(tmp_path):
    circ = str(tmp_path / "circ_t.nc")
    make_circ_file(circ, imt=8, jmt=8, km=3, seed=2, with_time_dim=True)
    g = load_grid(circ)
    assert (g.imt, g.jmt, g.km) == (8, 8, 3)
