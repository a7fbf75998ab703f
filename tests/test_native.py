"""Native C++ core vs numpy-fallback equivalence tests."""

import numpy as np
import pytest

from nk_ocn_tracer_jacobian_precond_tpu import native


@pytest.mark.skipif(native._load() is None, reason="no C++ toolchain")
def test_canonicalize_matches_numpy():
    rng = np.random.default_rng(0)
    n, flat_len = 5000, 300
    rows = rng.integers(0, flat_len, n)
    cols = rng.integers(0, flat_len, n)
    vals = rng.standard_normal(n)
    # inject exact cancellations and duplicates
    rows = np.concatenate([rows, rows[:100]])
    cols = np.concatenate([cols, cols[:100]])
    vals = np.concatenate([vals, -vals[:100]])

    nz_n, ci_n, rp_n = native.canonicalize_coo(rows, cols, vals, flat_len)

    # numpy reference with the same semantics
    seq = np.arange(len(rows))
    order = np.lexsort((seq, cols, rows))
    r, c, v = rows[order], cols[order], vals[order]
    key = r * flat_len + c
    new = np.ones(len(r), dtype=bool)
    new[1:] = key[1:] != key[:-1]
    starts = np.flatnonzero(new)
    summed = np.add.reduceat(v, starts)
    keep = summed != 0.0
    nz_p = summed[keep]
    ci_p = c[starts][keep]
    rp_p = np.zeros(flat_len + 1, dtype=np.int64)
    np.add.at(rp_p, r[starts][keep] + 1, 1)
    rp_p = np.cumsum(rp_p)

    np.testing.assert_array_equal(rp_n, rp_p)
    np.testing.assert_array_equal(ci_n, ci_p)
    # values: the C++ path is a strict left-to-right fold (the reference's
    # sum_dup order); numpy's reduceat may use pairwise summation
    # internally, so allow 1-2 ulp
    np.testing.assert_allclose(nz_n, nz_p, rtol=1e-15, atol=0)


@pytest.mark.skipif(native._load() is None, reason="no C++ toolchain")
def test_route_entries_matches_numpy():
    rng = np.random.default_rng(1)
    flat_len = 200
    density = 8
    cols = rng.integers(0, flat_len, flat_len * density)
    rowptr = np.arange(0, flat_len * density + 1, density)
    cell_node = rng.integers(0, 20, flat_len)
    cell_elim = rng.permutation(flat_len)
    out = native.route_entries(rowptr, cols, cell_node, cell_elim)
    rows = np.repeat(np.arange(flat_len), density)
    ref = np.where(cell_elim[cols] <= cell_elim[rows],
                   cell_node[cols], cell_node[rows])
    np.testing.assert_array_equal(out, ref)


@pytest.mark.skipif(native._load() is None, reason="no C++ toolchain")
def test_plan_entries_matches_numpy():
    rng = np.random.default_rng(2)
    flat_len = 200
    density = 8
    cols = rng.integers(0, flat_len, flat_len * density)
    rowptr = np.arange(0, flat_len * density + 1, density)
    nfronts = 20
    cell_node = rng.integers(0, nfronts, flat_len)
    cell_elim = rng.permutation(flat_len)
    ent_row, ent_col, ent_src, bounds = native.plan_entries(
        rowptr, cols, cell_node, cell_elim, nfronts)
    # numpy reference: route then stable counting sort by node
    rows = np.repeat(np.arange(flat_len), density)
    node = np.where(cell_elim[cols] <= cell_elim[rows],
                    cell_node[cols], cell_node[rows])
    order = np.argsort(node, kind="stable")
    np.testing.assert_array_equal(
        bounds, np.searchsorted(node[order], np.arange(nfronts + 1)))
    np.testing.assert_array_equal(ent_row, rows[order])
    np.testing.assert_array_equal(ent_col, cols[order])
    np.testing.assert_array_equal(ent_src, order)


@pytest.mark.skipif(native._load() is None, reason="no C++ toolchain")
def test_column_adjacency_matches_numpy():
    rng = np.random.default_rng(3)
    flat_len = 300
    density = 6
    cols = rng.integers(0, flat_len, flat_len * density)
    rowptr = np.arange(0, flat_len * density + 1, density)
    ncols = 40
    col_of_row = rng.integers(0, ncols, flat_len).astype(np.int32)
    src, dst = native.column_adjacency(rowptr, cols, col_of_row, ncols)
    got = set(zip(src.tolist(), dst.tolist()))
    rows = np.repeat(np.arange(flat_len), density)
    rc = col_of_row[rows]
    cc = col_of_row[cols]
    want = {(int(a), int(b)) for a, b in zip(rc, cc) if a != b}
    assert got == want
