"""Unit tests for the SINDy function library: term ordering must match the
reference (sindy.py:7-30) so that sindy_truth coefficient layouts carry over."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from symmetry_ode_discovery_tpu.ops.library import FunctionLibrary


def reference_theta(x, poly_order, include_sine, include_exp):
    """Direct numpy transcription of the reference term ordering."""
    cols = [np.ones((x.shape[0], 1))]
    d = x.shape[1]
    cols.append(x)
    if poly_order > 1:
        cols.append(np.stack([x[:, i] * x[:, j] for i in range(d) for j in range(i, d)], axis=1))
    if poly_order > 2:
        cols.append(np.stack([
            x[:, i] * x[:, j] * x[:, k]
            for i in range(d) for j in range(i, d) for k in range(j, d)
        ], axis=1))
    if include_sine:
        cols.append(np.sin(x))
    if include_exp:
        cols.append(np.exp(x))
    return np.concatenate(cols, axis=1)


@pytest.mark.parametrize("dim", [1, 2, 3])
@pytest.mark.parametrize("poly_order", [1, 2, 3])
@pytest.mark.parametrize("sine,exp", [(False, False), (True, False), (False, True), (True, True)])
def test_theta_matches_reference_ordering(dim, poly_order, sine, exp):
    lib = FunctionLibrary(dim, poly_order, sine, exp)
    x = np.random.default_rng(0).standard_normal((17, dim)).astype(np.float32)
    got = np.asarray(lib(jnp.asarray(x)))
    want = reference_theta(x, poly_order, sine, exp)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    assert lib.n_terms == want.shape[1]


def test_term_counts():
    # reference sindy.py:179-189
    assert FunctionLibrary(2, 2).n_terms == 6
    assert FunctionLibrary(2, 2, include_exp=True).n_terms == 8
    assert FunctionLibrary(2, 3, include_sine=True).n_terms == 12
    assert FunctionLibrary(3, 3).n_terms == 20


def test_term_names_align_with_truth_layout():
    # dosc truth layout: [1, z0, z1, z0z0, z0z1, z1z1]
    names = FunctionLibrary(2, 2).term_names()
    assert names == ["1", "z0", "z1", "z0*z0", "z0*z1", "z1*z1"]
    # lv layout (poly2 + exp): [..., exp(z0), exp(z1)]
    names = FunctionLibrary(2, 2, include_exp=True).term_names()
    assert names[-2:] == ["exp(z0)", "exp(z1)"]


def test_negative_base_no_nan():
    lib = FunctionLibrary(2, 3)
    x = jnp.array([[-1.5, -2.0]])
    out = lib(x)
    assert not jnp.any(jnp.isnan(out))
