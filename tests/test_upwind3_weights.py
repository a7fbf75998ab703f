"""Independent validation of the nonuniform vertical QUICK weights.

The loop oracle (tests/reference_impl.py) imports vertical_upwind3_weights
from the production package, so the weight transcription of
reference src/matrix.c:1870-1901 is shared code between oracle and
implementation. These tests pin the weights independently:

* uniform-grid limit: the classic QUICK constants 0.75 / 0.375 / -0.125
  (an analytic fact about the scheme, not a transcription);
* consistency: interior weights sum to 1 (a constant tracer profile is
  interpolated exactly) for arbitrary positive dz;
* golden values for one nonuniform dz, hand-verified against the
  reference formulas (talfzp = dz_k (2 dz_k + dz_{k-1}) /
  ((dz_k + dz_{k+1})(dz_{k-1} + 2 dz_k + dz_{k+1})) etc.,
  src/matrix.c:1872-1877).
"""

import numpy as np

from nk_ocn_tracer_jacobian_precond_tpu.ops.adv import vertical_upwind3_weights

NAMES = ["talfzp", "tbetzp", "tgamzp", "talfzm", "tbetzm", "tdelzm"]


def test_uniform_grid_recovers_classic_quick_constants():
    km = 7
    w = dict(zip(NAMES, vertical_upwind3_weights(np.full(km, 50.0))))
    inner = slice(1, km - 1)          # away from both boundary degradations
    assert np.allclose(w["talfzp"][inner], 0.375)
    assert np.allclose(w["tbetzp"][inner], 0.75)
    assert np.allclose(w["tgamzp"][inner], -0.125)
    assert np.allclose(w["talfzm"][:km - 1], 0.75)
    assert np.allclose(w["tbetzm"][:km - 1], 0.375)
    assert np.allclose(w["tdelzm"][:km - 1], -0.125)
    # surface boundary degradation folds tgamzp into tbetzp
    assert np.allclose(w["tbetzp"][0], 0.75 - 0.125)
    assert w["tgamzp"][0] == 0.0
    # bottom level carries no interface weights
    for n in NAMES:
        assert w[n][km - 1] == 0.0


def test_weights_sum_to_one_for_random_nonuniform_dz():
    rng = np.random.default_rng(3)
    dz = rng.uniform(5.0, 250.0, size=12)
    talfzp, tbetzp, tgamzp, talfzm, tbetzm, tdelzm = \
        vertical_upwind3_weights(dz)
    km = len(dz)
    s_zp = talfzp + tbetzp + tgamzp
    s_zm = talfzm + tbetzm + tdelzm
    assert np.allclose(s_zp[:km - 1], 1.0, atol=1e-14)
    assert np.allclose(s_zm[:km - 1], 1.0, atol=1e-14)


def test_golden_nonuniform_values():
    dz = np.array([10.0, 15.0, 25.0, 40.0, 70.0, 120.0])
    got = dict(zip(NAMES, vertical_upwind3_weights(dz)))
    golden = {
        "talfzp": [0.266666666667, 0.230769230769, 0.238095238095,
                   0.218181818182, 0.221052631579, 0.0],
        "tbetzp": [0.733333333333, 1.0, 1.0,
                   1.027972027972, 1.033492822967, 0.0],
        "tgamzp": [0.0, -0.230769230769, -0.238095238095,
                   -0.246153846154, -0.254545454545, 0.0],
        "talfzm": [0.55, 0.519230769231, 0.524475524476,
                   0.497607655502, 0.552631578947, 0.0],
        "tbetzm": [0.507692307692, 0.535714285714, 0.527472527473,
                   0.551515151515, 0.52876376989, 0.0],
        "tdelzm": [-0.057692307692, -0.054945054945, -0.051948051948,
                   -0.049122807018, -0.081395348837, 0.0],
    }
    for n in NAMES:
        np.testing.assert_allclose(got[n], golden[n], atol=1e-12)
    # spot-check one interior value straight from the reference formula
    k = 2
    c = lambda j: dz[min(max(j, 0), len(dz) - 1)]
    expect = dz[k] * (2 * dz[k] + c(k - 1)) / (dz[k] + dz[k + 1]) / (
        c(k - 1) + 2 * dz[k] + dz[k + 1])
    assert abs(got["talfzp"][k] - expect) < 1e-14
