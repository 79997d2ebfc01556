"""PCA / basis / embedding / LHS tests.

PCA gets a real parity check against sklearn (the reference's engine,
src/PCA.py:64-74) on identical data: variances must match and components
must match up to sign.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.config import (
    FingerprintConfig,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint import (
    embed as fpe,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.fingerprint.pca import (
    PCABasis,
    pca_from_samples,
)
from attributing_image_generative_models_using_latent_fingerprints_sg2_tpu.utils.lhs import (
    latin_hypercube,
    lhs_alpha_init,
)


def test_pca_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.decomposition")
    rng = np.random.default_rng(0)
    # anisotropic gaussian so the spectrum is distinct
    d = 16
    scales = np.linspace(3.0, 0.1, d)
    data = (rng.standard_normal((2000, d)) * scales).astype(np.float32)

    basis = pca_from_samples(jnp.asarray(data))
    ref = sklearn.PCA()
    ref.fit(data)

    np.testing.assert_allclose(
        np.asarray(basis.sigma) ** 2, ref.explained_variance_, rtol=1e-3
    )
    np.testing.assert_allclose(np.asarray(basis.mean), data.mean(0), atol=1e-5)
    # components match up to sign
    got = np.asarray(basis.pc)
    want = ref.components_
    dots = np.abs(np.sum(got * want, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-3)


def test_pca_orthonormal_rows():
    rng = np.random.default_rng(1)
    data = rng.standard_normal((500, 8)).astype(np.float32)
    basis = pca_from_samples(jnp.asarray(data))
    pc = np.asarray(basis.pc)
    np.testing.assert_allclose(pc @ pc.T, np.eye(8), atol=1e-4)


def _toy_basis(d=12, key_len=4, shift=8, sigma=1.0, sd=1.0):
    rng = np.random.default_rng(3)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    pca = PCABasis(
        pc=jnp.asarray(q.T, jnp.float32),
        sigma=jnp.asarray(np.linspace(2.0, 0.1, d), jnp.float32),
        mean=jnp.asarray(rng.standard_normal(d), jnp.float32),
    )
    fp = FingerprintConfig(key_len=key_len, shift=shift, sigma=sigma, sd_moved=sd)
    return pca, fpe.build_basis(pca, fp)


def test_basis_slicing_matches_reference_layout():
    """u_cap = pc[0:shift] ++ pc[shift+key_len:]; v_cap = pc[shift:shift+key_len]
    (ref src/main.py:30-40)."""
    pca, basis = _toy_basis()
    pc = np.asarray(pca.pc)
    np.testing.assert_array_equal(np.asarray(basis.v_cap), pc[8:12])
    np.testing.assert_array_equal(np.asarray(basis.u_cap), pc[:8])
    np.testing.assert_array_equal(np.asarray(basis.sigma_key), np.ones(4))
    np.testing.assert_allclose(
        np.asarray(basis.max_alpha), 3 * np.asarray(pca.sigma)[:8], rtol=1e-6
    )


def test_embed_formula():
    """wx = U^T a + mu + c (s*k) V, checked against explicit matmuls."""
    pca, basis = _toy_basis(sd=2.5)
    rng = np.random.default_rng(4)
    alpha = rng.standard_normal((3, 8)).astype(np.float32)
    bits = (rng.random((3, 4)) < 0.5).astype(np.float32)
    w0, wx = fpe.embed(basis, jnp.asarray(alpha), jnp.asarray(bits))
    u = np.asarray(basis.u_cap)
    v = np.asarray(basis.v_cap)
    mean = np.asarray(basis.mean)
    want_w0 = alpha @ u + mean
    want_wx = want_w0 + 2.5 * (bits * np.asarray(basis.sigma_key)) @ v
    np.testing.assert_allclose(np.asarray(w0), want_w0, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wx), want_wx, rtol=1e-5, atol=1e-5)


def test_embed_key_recoverable_in_exact_arithmetic():
    """Projecting wx onto V recovers c*s*k exactly (orthonormal basis)."""
    pca, basis = _toy_basis(sigma=1.5, sd=2.0)
    rng = np.random.default_rng(5)
    alpha = rng.standard_normal((2, 8)).astype(np.float32)
    bits = np.array([[1, 0, 1, 1], [0, 0, 1, 0]], np.float32)
    w0, wx = fpe.embed(basis, jnp.asarray(alpha), jnp.asarray(bits))
    coords = (np.asarray(wx) - np.asarray(basis.mean)) @ np.asarray(basis.v_cap).T
    rec = coords / (2.0 * 1.5)
    np.testing.assert_allclose(rec, bits, atol=1e-4)


def test_project_latent_fixes_content_component():
    pca, basis = _toy_basis()
    rng = np.random.default_rng(6)
    alpha = rng.standard_normal((2, 8)).astype(np.float32)
    w0, wx = fpe.embed(
        basis, jnp.asarray(alpha), jnp.asarray(np.ones((2, 4), np.float32))
    )
    # w0's U-component is alpha; projecting w0 returns U^T alpha (mean removed)
    proj = fpe.project_latent(basis, w0)
    want = alpha @ np.asarray(basis.u_cap)
    np.testing.assert_allclose(np.asarray(proj), want, atol=1e-4)


def test_alpha_bound_penalty_per_sample():
    pca, basis = _toy_basis()
    a = jnp.stack(
        [
            basis.max_alpha + 1.0,  # violates every upper bound by 1
            (basis.max_alpha + basis.min_alpha) / 2,  # inside
        ]
    )
    pen = fpe.alpha_bound_penalty(basis, a)
    np.testing.assert_allclose(np.asarray(pen), [8.0, 0.0], atol=1e-5)


def test_sample_key_bits_binary():
    bits = fpe.sample_key_bits(jax.random.PRNGKey(0), 64, 16)
    arr = np.asarray(bits)
    assert arr.shape == (16, 64)
    assert set(np.unique(arr)) <= {0.0, 1.0}
    assert 0.3 < arr.mean() < 0.7


def test_bit_accuracy():
    a = jnp.asarray([[1.0, 0.0, 1.0, 1.0]])
    b = jnp.asarray([[1.0, 1.0, 1.0, 0.0]])
    np.testing.assert_allclose(np.asarray(fpe.bit_accuracy(a, b)), [0.5])


def test_latin_hypercube_stratification():
    n, d = 16, 5
    s = np.asarray(latin_hypercube(jax.random.PRNGKey(2), n, d))
    assert s.shape == (n, d)
    for j in range(d):
        strata = np.sort(np.floor(s[:, j] * n).astype(int))
        np.testing.assert_array_equal(strata, np.arange(n))
        # centered: values are exactly (i + 0.5)/n
        np.testing.assert_allclose(np.sort(s[:, j]), (np.arange(n) + 0.5) / n)


def test_lhs_alpha_init_range():
    sigma = jnp.asarray(np.linspace(0.5, 2.0, 6), jnp.float32)
    a = np.asarray(lhs_alpha_init(jax.random.PRNGKey(3), 8, sigma))
    assert a.shape == (8, 6)
    assert (np.abs(a) <= np.asarray(sigma)[None] + 1e-6).all()
