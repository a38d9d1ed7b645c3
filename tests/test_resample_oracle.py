"""Pin ops/resize.py against the INDEPENDENT resampling oracle
(tests/_resample_oracle.py) — round-4 verdict item 4: until now the golden
gates shared the repo spline kernel on both sides.

Three layers:
1. the oracle's spline pieces are DERIVED (cardinal natural spline) and
   must equal the published AviSynth/zimg constants — exact fractions;
2. interpolation sanity of the derived kernels (delta at integers,
   partition-of-unity normalization after row renormalization);
3. the matrix-based ops.resize must match the scalar gather oracle on
   random images across kernels, up/down scales and boundary-heavy
   geometries.
"""
import os
import sys
from fractions import Fraction

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

from _resample_oracle import (
    oracle_resize,
    spline_kernel_pieces,
    _spline_eval,
)


# Published AviSynth/zimg SplineNN coefficients (independent cross-check
# values — e.g. the spline36 pieces quoted across AviSynth documentation).
PUBLISHED = {
    2: [("1", "-9/5", "-1/5", "1"),
        ("-1/3", "4/5", "-7/15", "0")],
    3: [("13/11", "-453/209", "-3/209", "1"),
        ("-6/11", "270/209", "-156/209", "0"),
        ("1/11", "-45/209", "26/209", "0")],
    4: [("49/41", "-6387/2911", "-3/2911", "1"),
        ("-24/41", "4032/2911", "-2328/2911", "0"),
        ("6/41", "-1008/2911", "582/2911", "0"),
        ("-1/41", "168/2911", "-97/2911", "0")],
}


@pytest.mark.parametrize("n_half", [2, 3, 4])
def test_derived_pieces_match_published(n_half):
    got = spline_kernel_pieces(n_half)
    want = PUBLISHED[n_half]
    for g, w in zip(got, want):
        for gv, wv in zip(g, w):
            assert abs(gv - float(Fraction(wv))) < 1e-14, (n_half, g, w)


@pytest.mark.parametrize("n_half", [2, 3, 4])
def test_kernel_interpolates_delta(n_half):
    x = np.arange(-n_half, n_half + 1, dtype=np.float64)
    k = _spline_eval(x, n_half)
    want = (x == 0).astype(np.float64)
    np.testing.assert_allclose(k, want, atol=1e-12)


def test_repo_spline_tables_match_derivation():
    """The constants hard-coded in ops/resize.py must equal the
    independent derivation (they were transcribed, not derived)."""
    from havc_tpu.ops import resize as rz

    for n_half, table in [(2, rz._SPLINE16), (3, rz._SPLINE36),
                          (4, rz._SPLINE64)]:
        for got, want in zip(table, spline_kernel_pieces(n_half)):
            np.testing.assert_allclose(got, want, atol=1e-14)


GEOMETRIES = [
    (37, 64), (64, 37),        # non-integer up/down
    (48, 96), (96, 48),        # exact 2x
    (13, 128), (128, 13),      # extreme ratios, boundary-heavy rows
    (61, 60),                  # near-identity
]


@pytest.mark.parametrize("kernel", ["spline16", "spline36", "spline64",
                                    "bicubic", "lanczos", "bilinear"])
@pytest.mark.parametrize("h_in,h_out", GEOMETRIES)
def test_resize_matches_oracle_1axis(kernel, h_in, h_out):
    import jax.numpy as jnp

    from havc_tpu.ops.resize import resize

    rng = np.random.default_rng(h_in * 1000 + h_out)
    img = rng.random((1, h_in, 40, 3), dtype=np.float64)
    want = oracle_resize(img, h_out, 40, kernel)
    got = np.asarray(
        resize(jnp.asarray(img, jnp.float32), h_out, 40, kernel),
        np.float64,
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


@pytest.mark.parametrize("kernel", ["spline36", "spline64"])
def test_resize_matches_oracle_2d(kernel):
    import jax.numpy as jnp

    from havc_tpu.ops.resize import resize

    rng = np.random.default_rng(7)
    img = rng.random((2, 53, 71, 3), dtype=np.float64)
    for hw in [(96, 128), (27, 33)]:
        want = oracle_resize(img, *hw, kernel)
        got = np.asarray(
            resize(jnp.asarray(img, jnp.float32), *hw, kernel), np.float64
        )
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_resize_matches_oracle_no_antialias():
    import jax.numpy as jnp

    from havc_tpu.ops.resize import resize

    rng = np.random.default_rng(9)
    img = rng.random((1, 64, 64, 3), dtype=np.float64)
    want = oracle_resize(img, 24, 24, "bilinear", antialias=False)
    got = np.asarray(
        resize(jnp.asarray(img, jnp.float32), 24, 24, "bilinear",
               antialias=False),
        np.float64,
    )
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)


def test_boundary_is_replicate():
    """Out-of-range taps accumulate onto the edge sample (zimg replicate
    semantics): resizing a constant image must stay exactly constant, and
    an edge-impulse must not wrap or zero-pad."""
    import jax.numpy as jnp

    from havc_tpu.ops.resize import resize

    const = np.full((1, 31, 9, 1), 0.6, np.float64)
    got = np.asarray(resize(jnp.asarray(const, jnp.float32), 77, 9,
                            "spline64"), np.float64)
    np.testing.assert_allclose(got, 0.6, atol=1e-6)

    imp = np.zeros((1, 16, 4, 1), np.float64)
    imp[0, 0] = 1.0  # top-edge impulse
    want = oracle_resize(imp, 40, 4, "spline36")
    got = np.asarray(resize(jnp.asarray(imp, jnp.float32), 40, 4,
                            "spline36"), np.float64)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=0)
