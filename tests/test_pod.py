import jax
import jax.numpy as jnp
import numpy as np
import pytest

from finitedifference_tpu.pod import (
    pod,
    podsize,
    randomized_svd,
    randomized_svd_adaptive,
    split_basis,
)


def decaying_matrix(m=300, n=80, decay=0.5, seed=0):
    rng = np.random.default_rng(seed)
    u, _ = np.linalg.qr(rng.normal(size=(m, n)))
    v, _ = np.linalg.qr(rng.normal(size=(n, n)))
    s = decay ** np.arange(n)
    return (u * s) @ v.T


class TestRandomizedSVD:
    def test_matches_exact_svd(self):
        a = decaying_matrix()
        k = 20
        u, s, vh = randomized_svd(jnp.asarray(a), k)
        s_exact = np.linalg.svd(a, compute_uv=False)[:k]
        np.testing.assert_allclose(np.asarray(s), s_exact, rtol=1e-9)
        # subspace: reconstruction error at rank k equals exact truncation
        recon = np.asarray((u * s) @ vh)
        err = np.linalg.norm(a - recon)
        err_exact = np.linalg.norm(s_exact[-1] * 0 + np.linalg.svd(
            a, compute_uv=False)[k:])
        assert err <= err_exact * 1.01 + 1e-12

    def test_pod_svd_vs_rsvd(self):
        a = decaying_matrix()
        u1, s1 = pod(a, num_modes=15, method="svd")
        u2, s2 = pod(a, num_modes=15, method="rsvd", random_state=3)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-8)
        # modes equal up to sign
        dots = np.abs(np.sum(np.asarray(u1) * np.asarray(u2), axis=0))
        np.testing.assert_allclose(dots, 1.0, atol=1e-7)

    def test_unknown_method(self):
        with pytest.raises(ValueError):
            pod(np.eye(4), method="qr")


class TestPodsize:
    def test_energy_threshold(self):
        svals = np.array([10.0, 1.0, 0.1, 0.01])
        energies = np.cumsum(svals**2) / np.sum(svals**2)
        n = podsize(svals, energy_thresh=0.999)
        assert energies[n] >= 0.999 and (n == 0 or energies[n - 1] < 0.999)

    def test_bounds(self):
        svals = np.array([10.0, 1.0, 0.1, 0.01])
        assert podsize(svals, energy_thresh=0.5, min_size=3) == 3
        assert podsize(svals, energy_thresh=0.999999, max_size=1) == 1
        assert podsize(svals, min_size=2) == 2

    def test_requires_criterion(self):
        with pytest.raises(ValueError):
            podsize(np.ones(3))

    def test_unreachable_threshold_falls_back_to_all_modes(self):
        # energy_thresh above 1.0 is never reached; the old
        # np.argmax silently returned 0 modes here (ADVICE.md)
        svals = np.array([10.0, 1.0, 0.1])
        assert podsize(svals, energy_thresh=1.0 + 1e-9) == 3


class TestAdaptive:
    def test_rank_discovery(self):
        a = decaying_matrix(decay=0.3)
        u, s, vh = randomized_svd_adaptive(jnp.asarray(a), tol=1e-8,
                                           initial_rank=4)
        recon = np.asarray((u * s) @ vh)
        rel = np.linalg.norm(a - recon) / np.linalg.norm(a)
        assert rel <= 1e-7
        assert u.shape[1] < min(a.shape)  # actually truncated

    def test_zero_matrix(self):
        u, s, vh = randomized_svd_adaptive(jnp.zeros((10, 5)), tol=1e-8)
        assert s.shape == (0,)


class TestSplitBasis:
    def test_split(self):
        u = np.arange(20.0).reshape(4, 5)
        up, us = split_basis(u, 2)
        assert up.shape == (4, 2) and us.shape == (4, 3)
        up, us = split_basis(u, 2, num_secondary=2)
        assert us.shape == (4, 2)
        np.testing.assert_array_equal(np.asarray(us), u[:, 2:4])
