"""Unit tests for the basis math against scipy closed-form oracles
(the oracle role the reference's utils/sbf.py sympy pipeline plays)."""

import numpy as np
import pytest

import jax.numpy as jnp

from pamnet_tpu.ops import bessel
from pamnet_tpu.ops.basis import (
    bessel_rbf,
    envelope,
    legendre_cbf,
    spherical_basis,
    spherical_basis_edge_rbf,
    spherical_jn_all,
)

scipy_special = pytest.importorskip("scipy.special")


def test_sph_jn_matches_scipy():
    # The closed forms cancel catastrophically only as x -> 0; the model always
    # evaluates at arg = z_{l,n} * (d/cutoff) >= ~0.5 (reference inherits the
    # identical closed forms via sympy, layers/basic.py:104).
    x = np.linspace(0.4, 40.0, 400)
    for l in range(8):
        ours = bessel.sph_jn(l, x)
        oracle = scipy_special.spherical_jn(l, x)
        np.testing.assert_allclose(ours, oracle, rtol=1e-7, atol=1e-9)


def test_sph_jn_zeros_match_scipy_roots():
    zeros = bessel.sph_jn_zeros(7, 6)
    # j_0 zeros are exactly n*pi.
    np.testing.assert_allclose(zeros[0], np.arange(1, 7) * np.pi, rtol=1e-12)
    # Every returned value must be a root of the right order, and roots of
    # consecutive orders must interlace.
    for l in range(7):
        vals = scipy_special.spherical_jn(l, zeros[l])
        np.testing.assert_allclose(vals, 0.0, atol=1e-8)
        assert np.all(np.diff(zeros[l]) > 0)
        if l > 0:
            assert np.all(zeros[l - 1] < zeros[l])


def test_envelope_closed_form():
    p = 5
    a = -(p + 1) * (p + 2) / 2.0
    b = p * (p + 2)
    c = -p * (p + 1) / 2.0
    x = np.linspace(0.05, 0.999, 100)
    expected = 1.0 / x + a * x**p + b * x ** (p + 1) + c * x ** (p + 2)
    got = np.asarray(envelope(jnp.asarray(x), p))
    # Near x -> 1 the four terms cancel to ~0, so float32 needs an atol.
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-5)
    # Zero at and beyond the cutoff; smooth approach to zero.
    x_out = np.array([1.0, 1.5, 2.0, 10.0])
    np.testing.assert_array_equal(np.asarray(envelope(jnp.asarray(x_out), p)), 0.0)
    assert abs(float(envelope(jnp.asarray(0.9999), p))) < 1e-3


def test_bessel_rbf_formula():
    cutoff = 5.0
    freq = np.arange(1, 17) * np.pi
    dist = np.array([0.9, 1.7, 3.3, 4.9, 10.0])  # last is "padded": >= cutoff
    got = np.asarray(bessel_rbf(jnp.asarray(dist), jnp.asarray(freq), cutoff))
    x = dist[:, None] / cutoff
    p = 5
    a, b, c = -21.0, 35.0, -15.0
    env = np.where(x < 1, 1 / x + a * x**p + b * x ** (p + 1) + c * x ** (p + 2), 0)
    expected = env * np.sin(freq * x)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-6)
    assert np.all(got[-1] == 0.0)  # padded distance -> exactly zero


def test_spherical_edge_rbf_matches_scipy():
    ns, nr, cutoff = 7, 6, 5.0
    t = bessel.bessel_basis_tables(ns, nr)
    dist = np.array([0.8, 1.5, 2.4, 3.7, 4.9])
    got = np.asarray(
        spherical_basis_edge_rbf(jnp.asarray(dist), ns, nr, cutoff)
    )
    x = dist / cutoff
    p = 5
    a, b, c = -21.0, 35.0, -15.0
    env = 1 / x + a * x**p + b * x ** (p + 1) + c * x ** (p + 2)
    for l in range(ns):
        for n in range(nr):
            oracle = (
                env
                * t["norm"][l, n]
                * scipy_special.spherical_jn(l, t["zeros"][l, n] * x)
            )
            np.testing.assert_allclose(got[:, l, n], oracle, rtol=2e-4, atol=1e-5)


def test_spherical_jn_all_stable_in_f32():
    # Sweep the full operating range, including the midrange where naive f32
    # closed forms cancel catastrophically (the stable evaluator must not).
    arg = np.concatenate(
        [np.linspace(0.01, 0.99, 40), np.linspace(1.0, 8.9, 60), np.linspace(9.0, 30.0, 40)]
    )
    lmax = 7
    got = np.asarray(spherical_jn_all(jnp.asarray(arg, dtype=jnp.float32), lmax))
    assert np.all(np.isfinite(got))
    for l in range(lmax + 1):
        oracle = scipy_special.spherical_jn(l, arg)
        np.testing.assert_allclose(got[:, l], oracle, rtol=5e-4, atol=2e-6)


def test_legendre_cbf_matches_scipy():
    ns = 7
    theta = np.linspace(0.01, np.pi - 0.01, 50)
    got = np.asarray(legendre_cbf(jnp.asarray(theta), ns))
    for l in range(ns):
        pref = np.sqrt((2 * l + 1) / (4 * np.pi))
        oracle = pref * scipy_special.eval_legendre(l, np.cos(theta))
        np.testing.assert_allclose(got[:, l], oracle, rtol=1e-4, atol=1e-6)
    # l=0 channel is the constant Y_00 = 0.28209479 (reference layers/basic.py:97-99)
    np.testing.assert_allclose(got[:, 0], 0.28209479, rtol=1e-5)


def test_spherical_basis_shape_and_gather():
    ns, nr, cutoff = 7, 6, 5.0
    dist = jnp.asarray(np.array([1.0, 2.0, 3.0, 10.0]))  # edge 3 is padded
    angle = jnp.asarray(np.array([0.3, 1.2, 2.2]))
    idx = jnp.asarray(np.array([0, 2, 3]))  # triplet 2 gathers the padded edge
    out = np.asarray(spherical_basis(dist, angle, idx, ns, nr, cutoff))
    assert out.shape == (3, ns * nr)
    assert np.all(out[2] == 0.0)  # padded edge's rbf is exactly zero
    assert np.all(np.isfinite(out))
