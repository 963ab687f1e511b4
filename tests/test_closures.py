"""Closure models: RBF (global/kNN), GP, RNM MLP, autoencoder — analytic
Jacobians vs jax.jacfwd, fit quality, and manifold ROM parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from finitedifference_tpu.closures.ann import init_rnm, rnm_closure
from finitedifference_tpu.closures.autoencoder import (
    ScaledAE,
    ae_decoder_fns,
    init_autoencoder,
)
from finitedifference_tpu.closures.common import (
    fit_minmax,
    manifold_decoder,
)
from finitedifference_tpu.closures.gp import (
    fit_gp,
    gp_closure,
    gp_jacobian,
    gp_predict,
)
from finitedifference_tpu.closures.rbf import (
    KERNELS,
    fit_global_rbf,
    fit_knn_rbf,
    global_rbf_closure,
    knn_rbf_closure,
    rbf_global_jacobian,
    rbf_global_predict,
    rbf_knn_jacobian,
    rbf_knn_predict,
)
from finitedifference_tpu.grid import Grid2D
from finitedifference_tpu.pod import pod, split_basis
from finitedifference_tpu.rom import lspg_prom, manifold_rom
from finitedifference_tpu.snapshots import relative_error_pct


def smooth_data(n_train=40, n_p=3, n_s=5, seed=0):
    """Training pairs sampled from a smooth nonlinear map."""
    rng = np.random.default_rng(seed)
    q_p = rng.uniform(-1, 1, size=(n_train, n_p)) * np.array([2.0, 1.0, 3.0])
    a = rng.normal(size=(n_p, n_s))
    q_s = np.sin(q_p @ a) + 0.3 * (q_p**2) @ np.abs(a)
    return q_p, q_s


class TestScaler:
    def test_matches_sklearn(self):
        from sklearn.preprocessing import MinMaxScaler as SkScaler
        rng = np.random.default_rng(0)
        data = rng.normal(size=(20, 4)) * np.array([1, 10, 0.1, 5])
        ours = fit_minmax(data)
        sk = SkScaler(feature_range=(-1, 1)).fit(data)
        x = rng.normal(size=4)
        np.testing.assert_allclose(
            np.asarray(ours.transform(jnp.asarray(x))),
            sk.transform(x[None])[0], atol=1e-12)
        np.testing.assert_allclose(np.asarray(ours.scale_), sk.scale_,
                                   atol=1e-12)


class TestGlobalRBF:
    @pytest.mark.parametrize("kernel", sorted(KERNELS))
    def test_analytic_jacobian_matches_jacfwd(self, kernel):
        q_p, q_s = smooth_data()
        eps = 0.7
        model = fit_global_rbf(q_p, q_s, eps, kernel=kernel)
        y = jnp.asarray(q_p[7] + 0.01)   # off a training point
        jac = rbf_global_jacobian(model, y)
        jac_ad = jax.jacfwd(lambda z: rbf_global_predict(model, z))(y)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                                   rtol=1e-9, atol=1e-11)

    def test_interpolates_training_points(self):
        q_p, q_s = smooth_data()
        model = fit_global_rbf(q_p, q_s, 1.0, kernel="gaussian",
                               lambda_reg=0.0)
        pred = rbf_global_predict(model, jnp.asarray(q_p[5]))
        np.testing.assert_allclose(np.asarray(pred), q_s[5], atol=1e-6)

    def test_generalizes(self):
        q_p, q_s = smooth_data(n_train=200)
        model = fit_global_rbf(q_p, q_s, 1.0, kernel="imq")
        rng = np.random.default_rng(3)
        x = rng.uniform(-0.5, 0.5, size=3) * np.array([2.0, 1.0, 3.0])
        a = np.sin  # recompute the target
        q_p2, q_s2 = smooth_data(n_train=1, seed=0)
        # evaluate the same smooth map at x
        rngr = np.random.default_rng(0)
        _ = rngr.uniform(-1, 1, size=(200, 3))
        a_mat = rngr.normal(size=(3, 5))
        target = np.sin(x @ a_mat) + 0.3 * (x**2) @ np.abs(a_mat)
        pred = rbf_global_predict(model, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(pred), target, atol=0.05)


class TestKNNRBF:
    @pytest.mark.parametrize("kernel", ["gaussian", "imq", "multiquadric"])
    def test_analytic_jacobian_matches_jacfwd(self, kernel):
        q_p, q_s = smooth_data()
        model = fit_knn_rbf(q_p, q_s, 0.8, neighbors=10, kernel=kernel)
        y = jnp.asarray(q_p[3] + 0.02)
        jac = rbf_knn_jacobian(model, y)
        jac_ad = jax.jacfwd(lambda z: rbf_knn_predict(model, z))(y)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                                   rtol=1e-8, atol=1e-10)

    def test_knn_accuracy(self):
        q_p, q_s = smooth_data(n_train=300)
        model = fit_knn_rbf(q_p, q_s, 1.0, neighbors=25)
        rng = np.random.default_rng(1)
        rngr = np.random.default_rng(0)
        _ = rngr.uniform(-1, 1, size=(300, 3))
        a_mat = rngr.normal(size=(3, 5))
        x = rng.uniform(-0.4, 0.4, size=3)
        target = np.sin(x @ a_mat) + 0.3 * (x**2) @ np.abs(a_mat)
        pred = rbf_knn_predict(model, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(pred), target, atol=0.1)

    def test_vmappable(self):
        q_p, q_s = smooth_data()
        model = fit_knn_rbf(q_p, q_s, 0.8, neighbors=8)
        ys = jnp.asarray(q_p[:6] + 0.01)
        out = jax.vmap(lambda y: rbf_knn_predict(model, y))(ys)
        assert out.shape == (6, 5)


class TestGP:
    def test_jacobian_matches_jacfwd(self):
        q_p, q_s = smooth_data()
        model = fit_gp(q_p, q_s, optimize=True, num_steps=50)
        y = jnp.asarray(q_p[4] + 0.05)
        jac = gp_jacobian(model, y)
        jac_ad = jax.jacfwd(lambda z: gp_predict(model, z))(y)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                                   rtol=1e-9, atol=1e-11)

    def test_ard_beats_isotropic_on_anisotropic_map(self):
        """Per-dimension length scales (ard=True) fit a map whose inputs
        act on very different scales better than the reference's single
        isotropic Matern scale; Jacobian parity with jacfwd holds for
        the vector length_scale too."""
        rng = np.random.default_rng(3)
        q_p = rng.uniform(-1, 1, size=(120, 3)) * np.array([5.0, 0.1, 1.0])
        q_s = (np.sin(3.0 * q_p[:, [1]]) + 0.1 * q_p[:, [0]]
               + 0.3 * q_p[:, [2]] ** 2)
        te_p = rng.uniform(-1, 1, size=(40, 3)) * np.array([5.0, 0.1, 1.0])
        te_s = (np.sin(3.0 * te_p[:, [1]]) + 0.1 * te_p[:, [0]]
                + 0.3 * te_p[:, [2]] ** 2)

        def err(model):
            pred = np.stack([np.asarray(gp_predict(model, jnp.asarray(x)))
                             for x in te_p])
            return np.linalg.norm(pred - te_s) / np.linalg.norm(te_s)

        iso = fit_gp(q_p, q_s, num_steps=300)
        ard = fit_gp(q_p, q_s, num_steps=300, ard=True)
        assert ard.length_scale.shape == (3,)
        assert err(ard) < err(iso)
        y = jnp.asarray(te_p[0])
        np.testing.assert_allclose(
            np.asarray(gp_jacobian(ard, y)),
            np.asarray(jax.jacfwd(lambda z: gp_predict(ard, z))(y)),
            rtol=1e-8, atol=1e-10)

    def test_fit_quality(self):
        q_p, q_s = smooth_data(n_train=150)
        model = fit_gp(q_p, q_s, num_steps=300)
        # near-interpolation at training points with tiny noise
        pred = gp_predict(model, jnp.asarray(q_p[10]))
        np.testing.assert_allclose(np.asarray(pred), q_s[10], atol=1e-3)

    def test_hyperparameter_optimization_helps(self):
        q_p, q_s = smooth_data(n_train=100)
        m_opt = fit_gp(q_p, q_s, num_steps=300)
        m_raw = fit_gp(q_p, q_s, optimize=False)
        rngr = np.random.default_rng(0)
        _ = rngr.uniform(-1, 1, size=(100, 3))
        a_mat = rngr.normal(size=(3, 5))
        x = np.array([0.3, -0.2, 0.5])
        target = np.sin(x @ a_mat) + 0.3 * (x**2) @ np.abs(a_mat)
        e_opt = np.linalg.norm(np.asarray(gp_predict(m_opt, jnp.asarray(x)))
                               - target)
        e_raw = np.linalg.norm(np.asarray(gp_predict(m_raw, jnp.asarray(x)))
                               - target)
        assert e_opt <= e_raw * 1.5  # optimized at least comparable


class TestVariationalGP:
    """Sparse variational GP (Titsias collapsed bound) — the
    reference's GPyTorch SVGP option
    (POD-GP/compute_gp_models_pytorch.py:259-321)."""

    def test_dense_inducing_matches_exact_gp(self):
        """With M=N inducing points the collapsed bound is the exact
        LML and the predictive mean is the exact GP's."""
        from finitedifference_tpu.closures.gp import fit_gp_variational

        q_p, q_s = smooth_data(n_train=60)
        exact = fit_gp(q_p, q_s, num_steps=200, ard=True, noise=1e-6)
        svgp = fit_gp_variational(q_p, q_s, num_inducing=60,
                                  num_steps=200, noise=1e-6)
        for x in q_p[[3, 17, 41]]:
            a = np.asarray(gp_predict(exact, jnp.asarray(x)))
            b = np.asarray(gp_predict(svgp, jnp.asarray(x)))
            np.testing.assert_allclose(b, a, rtol=0.05, atol=5e-3)

    def test_sparse_inducing_generalizes(self):
        """M << N stays close to the exact fit on held-out points and
        beats it on online cost (M kernel rows per predict)."""
        from finitedifference_tpu.closures.gp import fit_gp_variational

        q_all, s_all = smooth_data(n_train=240)
        q_p, q_s = q_all[:200], s_all[:200]
        te_p, te_s = q_all[200:], s_all[200:]
        exact = fit_gp(q_p, q_s, num_steps=200, ard=True, noise=1e-6)
        svgp = fit_gp_variational(q_p, q_s, num_inducing=40,
                                  num_steps=300, noise=1e-6)
        assert svgp.x_train.shape[0] == 40

        def err(model):
            pred = np.stack(
                [np.asarray(gp_predict(model, jnp.asarray(x)))
                 for x in te_p])
            return np.linalg.norm(pred - te_s) / np.linalg.norm(te_s)

        assert err(svgp) < max(2.0 * err(exact), 0.05)

    def test_closure_and_persistence_reuse_exact_machinery(self,
                                                          tmp_path):
        """fit_gp_variational returns a plain GPModel: closure
        Jacobian parity with jacfwd, save/load roundtrip byte-stable
        predictions, train_gp per_mode='variational' dispatch."""
        from finitedifference_tpu.closures.gp import fit_gp_variational
        from finitedifference_tpu.training.gp_train import (
            load_gp,
            save_gp,
            train_gp,
        )

        q_p, q_s = smooth_data(n_train=80)
        svgp = fit_gp_variational(q_p, q_s, num_inducing=24,
                                  num_steps=100, noise=1e-6)
        y = jnp.asarray(q_p[7] + 0.03)
        np.testing.assert_allclose(
            np.asarray(gp_jacobian(svgp, y)),
            np.asarray(jax.jacfwd(lambda z: gp_predict(svgp, z))(y)),
            rtol=1e-8, atol=1e-10)

        path = str(tmp_path / "svgp.npz")
        save_gp(svgp, path)
        back = load_gp(path)
        np.testing.assert_array_equal(
            np.asarray(gp_predict(back, y)),
            np.asarray(gp_predict(svgp, y)))

        via_train = train_gp(q_p, q_s, per_mode="variational",
                             num_inducing=24, num_steps=10,
                             noise=1e-6, on_host=False)
        assert via_train.x_train.shape[0] == 24


class TestPerModeGP:
    def _hetero_data(self, n_train=80, n_test=30, seed=0):
        """Outputs with magnitudes spanning 5 orders and different
        active input dimensions — the regime where one shared kernel
        over-smooths small modes (reference fits one GPR per mode,
        POD-GP/compute_gp_models.py)."""
        rng = np.random.default_rng(seed)
        f = lambda x: np.stack(
            [10.0 * np.sin(x[:, 0]), 0.01 * np.cos(2.0 * x[:, 1]),
             x[:, 2] ** 2, 1e-4 * x[:, 0] * x[:, 1],
             np.tanh(x).sum(axis=1)], axis=1)
        q_p = rng.normal(size=(n_train, 3))
        te_p = rng.normal(size=(n_test, 3))
        return q_p, f(q_p), te_p, f(te_p)

    def test_full_per_mode_beats_shared_on_heterogeneous_outputs(self):
        from finitedifference_tpu.closures.gp import (
            fit_gp_full_per_mode, per_mode_gp_predict)
        q_p, q_s, te_p, te_s = self._hetero_data()
        shared = fit_gp(q_p, q_s, num_steps=150, ard=True, noise=1e-6)
        perm = fit_gp_full_per_mode(q_p, q_s, num_steps=150, noise=1e-6,
                                    mode_chunk=2)
        scale = np.abs(te_s).max(axis=0)

        def err(pred_fn, model):
            pred = np.stack([np.asarray(pred_fn(model, jnp.asarray(x)))
                             for x in te_p])
            return np.linalg.norm((pred - te_s) / scale)

        assert perm.length_scale.shape == (5, 3)
        assert err(per_mode_gp_predict, perm) \
            < 0.7 * err(gp_predict, shared)

    def test_per_mode_jacobian_matches_jacfwd(self):
        from finitedifference_tpu.closures.gp import (
            fit_gp_full_per_mode, per_mode_gp_jacobian,
            per_mode_gp_predict)
        for nu in (1.5, 2.5):
            q_p, q_s, te_p, _ = self._hetero_data(n_train=50)
            model = fit_gp_full_per_mode(q_p, q_s, num_steps=40,
                                         noise=1e-6, nu=nu,
                                         mode_chunk=3)
            y = jnp.asarray(te_p[0])
            jac = per_mode_gp_jacobian(model, y)
            jac_ad = jax.jacfwd(
                lambda z: per_mode_gp_predict(model, z))(y)
            np.testing.assert_allclose(np.asarray(jac),
                                       np.asarray(jac_ad),
                                       rtol=1e-8, atol=1e-11)

    def test_per_mode_scales_returns_plain_gpmodel(self):
        """The eigenbasis (amp, noise)-per-mode fit folds back into an
        ordinary GPModel (amplitude 1) so the online closure is
        unchanged; it should track training data at least as well as
        the shared fit on heterogeneous outputs."""
        from finitedifference_tpu.closures.gp import (
            GPModel, fit_gp_per_mode)
        q_p, q_s, _, _ = self._hetero_data()
        m = fit_gp_per_mode(q_p, q_s, num_steps=150, noise=1e-6)
        assert isinstance(m, GPModel)
        assert float(m.amplitude) == 1.0
        pred = np.stack([np.asarray(gp_predict(m, jnp.asarray(x)))
                         for x in q_p[:20]])
        scale = np.abs(q_s).max(axis=0)
        assert np.linalg.norm((pred - q_s[:20]) / scale) \
            / np.sqrt(20 * q_s.shape[1]) < 0.05

    def test_save_load_roundtrip_per_mode(self, tmp_path):
        from finitedifference_tpu.closures.gp import (
            fit_gp_full_per_mode, per_mode_gp_predict)
        from finitedifference_tpu.training.gp_train import load_gp, save_gp
        q_p, q_s, te_p, _ = self._hetero_data(n_train=40)
        model = fit_gp_full_per_mode(q_p, q_s, num_steps=30, noise=1e-6)
        path = str(tmp_path / "gp_pm.npz")
        save_gp(model, path)
        back = load_gp(path)
        assert type(back).__name__ == "PerModeGPModel"
        y = jnp.asarray(te_p[0])
        np.testing.assert_allclose(
            np.asarray(per_mode_gp_predict(model, y)),
            np.asarray(per_mode_gp_predict(back, y)), rtol=1e-12)

    def test_closure_dispatch_fused_matches_separate(self):
        from finitedifference_tpu.closures.gp import (
            fit_gp_full_per_mode, gp_closure)
        q_p, q_s, te_p, _ = self._hetero_data(n_train=40)
        model = fit_gp_full_per_mode(q_p, q_s, num_steps=30, noise=1e-6)
        clo = gp_closure(model)
        y = jnp.asarray(te_p[1])
        p, j = clo.predict_and_jacobian(y)
        np.testing.assert_allclose(np.asarray(p),
                                   np.asarray(clo.predict(y)), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(j),
                                   np.asarray(clo.jacobian(y)), rtol=1e-12)


class TestRNM:
    def test_shapes_and_jacobian(self):
        module, params = init_rnm(q1_size=4, q2_size=9)
        # flax params default to f32; cast up for a strict FD check
        params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.float64), params)
        clo = rnm_closure(module, params)
        y = jnp.arange(4.0)
        assert clo.predict(y).shape == (9,)
        jac = clo.jacobian(y)
        assert jac.shape == (9, 4)
        # FD check of the jacfwd jacobian
        eps = 1e-6
        fd = (np.asarray(clo.predict(y + eps * jnp.eye(4)[0]))
              - np.asarray(clo.predict(y))) / eps
        np.testing.assert_allclose(np.asarray(jac[:, 0]), fd, atol=1e-5)


class TestAE:
    def test_roundtrip_shapes(self):
        rng = np.random.default_rng(0)
        mu = rng.normal(size=20)
        sig = np.abs(rng.normal(size=20)) + 0.5
        module, params = init_autoencoder(20, 3)
        ae = ScaledAE(module=module, params=params,
                      mu_in=jnp.asarray(mu), sig_in=jnp.asarray(sig))
        decode, dec_jac, encode = ae_decoder_fns(ae)
        w = jnp.asarray(rng.normal(size=20))
        z = encode(w)
        assert z.shape == (3,)
        assert decode(z).shape == (20,)
        assert dec_jac(z).shape == (20, 3)


class TestManifoldROM:
    def setup_problem(self, nx=10, ny=10, num_steps=20):
        grid = Grid2D(nx=nx, ny=ny, x_up=100.0, y_up=100.0)
        ops, xc = oracle.make_problem(nx=nx, ny=ny)
        w0 = np.ones(grid.state_dim)
        s1 = oracle.implicit_trajectory(w0, [4.25, 0.0225], 0.05, num_steps,
                                        ops, xc)
        s2 = oracle.implicit_trajectory(w0, [5.5, 0.015], 0.05, num_steps,
                                        ops, xc)
        snaps = np.hstack((s1, s2))
        return grid, ops, xc, w0, snaps

    def test_linear_closure_equals_lspg(self):
        grid, ops, xc, w0, snaps = self.setup_problem()
        basis = np.asarray(pod(snaps, num_modes=8, method="svd")[0])
        decode, dec_jac = manifold_decoder(basis, None, None)
        y0 = jnp.asarray(basis.T @ w0)
        res = manifold_rom(grid, y0, decode, dec_jac, 0.05, 10, 4.75, 0.02)
        prom = lspg_prom(grid, jnp.asarray(w0), 0.05, 10, 4.75, 0.02,
                         jnp.asarray(basis))
        np.testing.assert_allclose(np.asarray(res.red_coords),
                                   np.asarray(prom.red_coords),
                                   rtol=1e-10, atol=1e-12)

    def test_pod_rbf_global_rom(self):
        """POD-RBF manifold ROM beats the linear PROM of the same primary
        size at an out-of-sample point."""
        grid, ops, xc, w0, snaps = self.setup_problem(num_steps=25)
        u, s = pod(snaps, num_modes=20, method="svd")
        n_p = 4
        u_p, u_s = split_basis(np.asarray(u), n_p, 16)
        q = np.asarray(u).T @ snaps        # (20, S)
        q_p, q_s = q[:n_p].T, q[n_p:20].T
        model = fit_global_rbf(q_p, q_s, 0.5, kernel="gaussian")
        decode, dec_jac = manifold_decoder(u_p, u_s,
                                           global_rbf_closure(model))
        y0 = jnp.asarray(u_p.T @ w0)
        steps = 25
        res = manifold_rom(grid, y0, decode, dec_jac, 0.05, steps,
                           4.75, 0.02)
        rom_snaps = np.asarray(jax.vmap(decode, in_axes=1,
                                        out_axes=1)(res.red_coords))
        hdm = oracle.implicit_trajectory(w0, [4.75, 0.02], 0.05, steps,
                                         ops, xc)
        err_rbf = relative_error_pct(rom_snaps, hdm)

        prom = lspg_prom(grid, jnp.asarray(w0), 0.05, steps, 4.75, 0.02,
                         jnp.asarray(u_p))
        err_lin = relative_error_pct(
            np.asarray(u_p @ np.asarray(prom.red_coords)), hdm)
        assert err_rbf < err_lin
        assert err_rbf < 2.0


class TestFitReducedCoords:
    def test_gn_fit_beats_projection(self):
        """fit_reduced_coords (the reference's inner GN inside the
        closure ECSW builders, hypernet2D.py:2765-2773) must reduce the
        decode residual vs the plain projection start."""
        from finitedifference_tpu.solvers import fit_reduced_coords

        tm = TestManifoldROM()
        grid, ops, xc, w0, snaps = tm.setup_problem(num_steps=25)
        u, s = pod(snaps, num_modes=20, method="svd")
        n_p = 4
        u_p, u_s = split_basis(np.asarray(u), n_p, 16)
        q = np.asarray(u).T @ snaps
        q_p, q_s = q[:n_p].T, q[n_p:20].T
        model = fit_global_rbf(q_p, q_s, 0.5, kernel="gaussian")
        decode, dec_jac = manifold_decoder(u_p, u_s,
                                           global_rbf_closure(model))
        # out-of-sample snapshot
        snap = jnp.asarray(oracle.implicit_trajectory(
            w0, [4.75, 0.02], 0.05, 12, ops, xc)[:, -1])
        y_proj = jnp.asarray(u_p.T) @ snap
        out = fit_reduced_coords(decode, dec_jac, y_proj, snap)
        res_proj = float(jnp.linalg.norm(decode(y_proj) - snap))
        res_fit = float(jnp.linalg.norm(decode(out.y) - snap))
        assert res_fit < res_proj
        assert int(out.num_its) >= 1
        # converged fits stop on the reference's 1e-2 relative criterion
        assert res_fit / float(out.init_norm) < 1e-2 or \
            int(out.num_its) == 10


class TestIdentityScaler:
    def test_no_norm_rbf(self):
        from finitedifference_tpu.closures.common import identity_scaler
        q_p, q_s = smooth_data()
        model = fit_global_rbf(q_p, q_s, 0.3, kernel="gaussian",
                               scaler=identity_scaler(q_p.shape[1]))
        pred = rbf_global_predict(model, jnp.asarray(q_p[5]))
        np.testing.assert_allclose(np.asarray(pred), q_s[5], atol=1e-4)
        jac = rbf_global_jacobian(model, jnp.asarray(q_p[5] + 0.01))
        jac_ad = jax.jacfwd(lambda z: rbf_global_predict(model, z))(
            jnp.asarray(q_p[5] + 0.01))
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                                   atol=1e-10)


class TestFusedClosures:
    """predict_and_jacobian fused paths (one neighbor search / kernel
    evaluation per Gauss-Newton iteration instead of two) must agree
    with the separate predict/jacobian calls, and the manifold stepper
    must produce the same trajectory either way."""

    def test_knn_fused_matches_separate(self):
        q_p, q_s = smooth_data()
        model = fit_knn_rbf(q_p, q_s, 0.5, 12, kernel="gaussian")
        c = knn_rbf_closure(model)
        y = jnp.asarray(q_p[7] + 0.05)
        p, j = c.predict_and_jacobian(y)
        np.testing.assert_allclose(np.asarray(p), np.asarray(c.predict(y)),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(j), np.asarray(c.jacobian(y)),
                                   rtol=1e-12, atol=1e-14)

    def test_global_fused_matches_separate(self):
        q_p, q_s = smooth_data()
        model = fit_global_rbf(q_p, q_s, 0.5, kernel="matern")
        c = global_rbf_closure(model)
        y = jnp.asarray(q_p[3] - 0.04)
        p, j = c.predict_and_jacobian(y)
        np.testing.assert_allclose(np.asarray(p), np.asarray(c.predict(y)),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(j), np.asarray(c.jacobian(y)),
                                   rtol=1e-12, atol=1e-14)

    def test_gp_fused_matches_separate(self):
        q_p, q_s = smooth_data()
        model = fit_gp(q_p, q_s, noise=1e-6, num_steps=30)
        c = gp_closure(model)
        y = jnp.asarray(q_p[11] + 0.02)
        p, j = c.predict_and_jacobian(y)
        np.testing.assert_allclose(np.asarray(p), np.asarray(c.predict(y)),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(j), np.asarray(c.jacobian(y)),
                                   rtol=1e-12, atol=1e-14)

    def test_knn_cholesky_solve_matches_dense_solve(self):
        """The PD-kernel local solve (Cholesky) must reproduce the dense
        f64 ground truth of the local interpolation system."""
        q_p, q_s = smooth_data(n_train=60)
        k = 20
        model = fit_knn_rbf(q_p, q_s, 0.8, k, kernel="gaussian")
        y = jnp.asarray(q_p[9] + 0.03)
        x = np.asarray(model.scaler.transform(y))
        qn = np.asarray(model.q_p_train)
        d2 = ((qn - x[None, :]) ** 2).sum(axis=1)
        idx = np.argsort(d2)[:k]
        xk = qn[idx]
        phi_m = np.linalg.norm(xk[:, None, :] - xk[None, :, :], axis=-1)
        phi_m = np.exp(-((0.8 * phi_m) ** 2)) + 1e-8 * np.eye(k)
        w_ref = np.linalg.solve(phi_m, np.asarray(model.q_s_train)[idx])
        r = np.linalg.norm(xk - x[None, :], axis=1)
        want = np.exp(-((0.8 * r) ** 2)) @ w_ref
        got = np.asarray(rbf_knn_predict(model, y))
        np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-11)

    def test_stepper_fused_parity(self):
        """manifold_rom with decode_and_jac == without, f64 CPU."""
        from finitedifference_tpu.closures.common import (
            manifold_decoder_fused,
        )

        tm = TestManifoldROM()
        grid, ops, xc, w0, snaps = tm.setup_problem(num_steps=25)
        u, s = pod(snaps, num_modes=20, method="svd")
        u_p, u_s = split_basis(np.asarray(u), 4, 16)
        q = np.asarray(u).T @ snaps
        model = fit_knn_rbf(q[:4].T, q[4:20].T, 0.5, 15,
                            kernel="gaussian")
        c = knn_rbf_closure(model)
        decode, dec_jac = manifold_decoder(u_p, u_s, c)
        fused = manifold_decoder_fused(u_p, u_s, c)
        y0 = jnp.asarray(u_p.T @ w0)
        plain = manifold_rom(grid, y0, decode, dec_jac, 0.05, 10,
                             4.75, 0.02)
        with_f = manifold_rom(grid, y0, decode, dec_jac, 0.05, 10,
                              4.75, 0.02, decode_and_jac=fused)
        assert int(plain.total_gn_its) == int(with_f.total_gn_its)
        np.testing.assert_allclose(np.asarray(with_f.red_coords),
                                   np.asarray(plain.red_coords),
                                   rtol=1e-11, atol=1e-13)


class TestKNNRidge:
    """Local-system ridge as a searched hyperparameter + the
    mixed-precision refined solve it unlocks (closures/rbf.py)."""

    def test_mixed_precision_solve_matches_f64(self):
        """ridge >= 1e-6 routes the PD local solve through an f32
        Cholesky with f64 residual correction; predictions must match
        the pure-f64 factorization to f64 accuracy."""
        from finitedifference_tpu.closures.rbf import (
            _knn_gather,
            _knn_local_weights,
            fit_knn_rbf,
        )
        from jax.scipy.linalg import cho_factor, cho_solve
        from finitedifference_tpu.closures.rbf import kernel_matrix

        q_p, q_s = smooth_data(n_train=60)
        model = fit_knn_rbf(q_p, q_s, 0.8, 20, kernel="gaussian",
                            ridge=1e-5)
        y = jnp.asarray(q_p[9] + 0.03)
        x = model.scaler.transform(y)
        xk, yk = _knn_gather(model, x)
        got = np.asarray(_knn_local_weights(model, xk, yk))
        phi = kernel_matrix(xk, xk, model.epsilon, model.kernel) \
            + 1e-5 * jnp.eye(20, dtype=jnp.float64)
        want = np.asarray(cho_solve(cho_factor(phi), yk))
        np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    def test_default_ridge_is_reference_faithful(self):
        from finitedifference_tpu.closures.rbf import fit_knn_rbf

        q_p, q_s = smooth_data()
        model = fit_knn_rbf(q_p, q_s, 0.8, 10)
        assert model.ridge == 1e-8

    def test_search_sweeps_ridge(self):
        from finitedifference_tpu.training.rbf_train import (
            train_knn_rbf_search,
        )

        q_p, q_s = smooth_data(n_train=80)
        model, log = train_knn_rbf_search(
            q_p, q_s, epsilons=[0.5, 1.0], neighbor_counts=[10],
            ridges=[1e-8, 1e-5], verbose=False)
        assert "ridge" in log["best"]
        assert model.ridge == log["best"]["ridge"]
        assert len(log["grid"]) == 4


class TestMatern52:
    """nu=2.5 GP variant (sklearn Matern(nu) analogue): analytic
    Jacobian vs jacfwd, and fused vs separate."""

    def test_jacobian_matches_jacfwd(self):
        from finitedifference_tpu.closures.gp import (
            fit_gp,
            gp_jacobian,
            gp_predict,
        )

        q_p, q_s = smooth_data()
        model = fit_gp(q_p, q_s, optimize=True, num_steps=50, nu=2.5)
        y = jnp.asarray(q_p[7] + 0.05)
        jac = gp_jacobian(model, y)
        jac_ad = jax.jacfwd(lambda z: gp_predict(model, z))(y)
        np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ad),
                                   rtol=1e-8, atol=1e-10)

    def test_fused_matches_separate(self):
        from finitedifference_tpu.closures.gp import (
            fit_gp,
            gp_closure,
        )

        q_p, q_s = smooth_data()
        model = fit_gp(q_p, q_s, optimize=False, nu=2.5)
        c = gp_closure(model)
        y = jnp.asarray(q_p[3] + 0.02)
        p, j = c.predict_and_jacobian(y)
        np.testing.assert_allclose(np.asarray(p),
                                   np.asarray(c.predict(y)),
                                   rtol=1e-12, atol=1e-14)
        np.testing.assert_allclose(np.asarray(j),
                                   np.asarray(c.jacobian(y)),
                                   rtol=1e-12, atol=1e-14)

    def test_save_load_roundtrip_nu(self, tmp_path):
        from finitedifference_tpu.closures.gp import fit_gp
        from finitedifference_tpu.training.gp_train import (
            load_gp,
            save_gp,
        )

        q_p, q_s = smooth_data()
        model = fit_gp(q_p, q_s, optimize=False, nu=2.5)
        path = str(tmp_path / "gp52.npz")
        save_gp(model, path)
        back = load_gp(path)
        assert back.nu == 2.5
