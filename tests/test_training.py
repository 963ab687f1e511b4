"""Training loops: RNM MLP, autoencoder, RBF grid search, GP, monitor."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from finitedifference_tpu.closures.rbf import rbf_global_predict
from finitedifference_tpu.closures.gp import gp_predict
from finitedifference_tpu.training.ae_train import train_autoencoder
from finitedifference_tpu.training.data import random_split
from finitedifference_tpu.training.gp_train import (
    load_gp,
    save_gp,
    train_gp,
)
from finitedifference_tpu.training.monitor import TrainingMonitor
from finitedifference_tpu.training.rbf_train import (
    load_global_rbf,
    remove_duplicates,
    save_global_rbf,
    train_global_rbf,
)
from finitedifference_tpu.training.rnm_train import (
    project_snapshots,
    train_rnm,
)


def smooth_pairs(n=200, n_p=3, n_s=4, seed=0):
    rng = np.random.default_rng(seed)
    q_p = rng.uniform(-1, 1, size=(n, n_p))
    a = rng.normal(size=(n_p, n_s))
    q_s = np.tanh(q_p @ a)
    return q_p, q_s


class TestMonitor:
    def test_checkpoint_and_patience(self, tmp_path):
        path = str(tmp_path / "m.msgpack")
        mon = TrainingMonitor(path, patience=2)
        state = {"w": jnp.ones(3)}
        assert not mon.check_for_completion(1.0, 1.0, state)
        # no improvement for patience+1 epochs -> stop
        assert not mon.check_for_completion(1.0, 2.0, state)
        assert not mon.check_for_completion(1.0, 2.0, state)
        assert mon.check_for_completion(1.0, 2.0, state)
        # the checkpoint holds the best state
        fresh = TrainingMonitor(path, patience=2)
        restored = fresh.load_from_path(path, {"w": jnp.zeros(3)})
        np.testing.assert_array_equal(np.asarray(restored["w"]), 1.0)
        assert fresh.best_crit == 1.0

    def test_improvement_resets_patience(self, tmp_path):
        mon = TrainingMonitor(str(tmp_path / "m2.msgpack"), patience=1)
        s = {"w": jnp.zeros(1)}
        assert not mon.check_for_completion(1.0, 3.0, s)
        assert not mon.check_for_completion(1.0, 4.0, s)
        assert not mon.check_for_completion(1.0, 2.0, s)  # improved
        assert not mon.check_for_completion(1.0, 5.0, s)
        assert mon.check_for_completion(1.0, 5.0, s)


class TestRNMTraining:
    def test_learns_smooth_map(self, tmp_path):
        q_p, q_s = smooth_pairs()
        module, params, mon = train_rnm(
            q_p, q_s, epochs=300, lr=3e-3, batch_size=32, patience=100,
            model_path=str(tmp_path / "rnm.msgpack"))
        pred = jax.vmap(lambda x: module.apply(params, x))(
            jnp.asarray(q_p[:20]))
        err = np.linalg.norm(np.asarray(pred) - q_s[:20]) / \
            np.linalg.norm(q_s[:20])
        assert err < 0.1

    def test_resume_continues_from_checkpoint(self, tmp_path):
        # interrupt a fit at epoch 60, resume, and the combined run must
        # end at least as good as the interrupted checkpoint with the
        # epoch count carried on (reference train_utils.py resume path)
        q_p, q_s = smooth_pairs()
        path = str(tmp_path / "rnm.msgpack")
        _, _, mon1 = train_rnm(q_p, q_s, epochs=60, lr=3e-3,
                               batch_size=32, patience=100,
                               model_path=path)
        module, params, mon2 = train_rnm(
            q_p, q_s, epochs=150, lr=3e-3, batch_size=32, patience=100,
            model_path=path, resume=True)
        assert mon2.epoch > 60
        assert mon2.best_crit <= mon1.best_crit
        # history is contiguous across the interruption
        assert len(mon2.train_losses) == mon2.epoch

    def test_project_snapshots(self):
        rng = np.random.default_rng(0)
        basis = np.linalg.qr(rng.normal(size=(50, 10)))[0]
        snaps_t = rng.normal(size=(7, 50))
        q_p, q_s = project_snapshots(basis, snaps_t, 3, 5)
        assert q_p.shape == (7, 3) and q_s.shape == (7, 5)
        q_p2, _ = project_snapshots(basis, snaps_t, 3, 5,
                                    mu_labels=np.ones((7, 2)))
        assert q_p2.shape == (7, 5)


class TestAETraining:
    def test_reconstructs(self, tmp_path):
        # low-dimensional data embedded in 30-d
        rng = np.random.default_rng(1)
        z = rng.uniform(-1, 1, size=(300, 2))
        lift = rng.normal(size=(2, 30))
        x = np.tanh(z @ lift) * 3 + 1
        ae, mon = train_autoencoder(
            x, latent_dim=2, epochs=200, lr=3e-3, patience=60,
            model_path=str(tmp_path / "ae.msgpack"))
        recon = jax.vmap(ae.forward)(jnp.asarray(x[:30]))
        rel = np.linalg.norm(np.asarray(recon) - x[:30]) / \
            np.linalg.norm(x[:30])
        assert rel < 0.1


class TestRBFTraining:
    def test_dedup(self):
        q_p = np.array([[1.0, 2.0], [1.0, 2.0], [3.0, 4.0]])
        q_s = np.array([[1.0], [1.0], [2.0]])
        qp2, qs2 = remove_duplicates(q_p, q_s)
        assert qp2.shape == (2, 2)

    def test_grid_search_and_roundtrip(self, tmp_path):
        q_p, q_s = smooth_pairs(n=120)
        model, log = train_global_rbf(
            q_p, q_s, epsilons=np.logspace(-1, 0.7, 6),
            kernels=("gaussian", "imq"))
        assert log["best"]["kernel"] in ("gaussian", "imq")
        assert log["best"]["val_error"] < 0.05
        path = str(tmp_path / "rbf.npz")
        save_global_rbf(model, path)
        m2 = load_global_rbf(path)
        y = jnp.asarray(q_p[3])
        np.testing.assert_allclose(
            np.asarray(rbf_global_predict(model, y)),
            np.asarray(rbf_global_predict(m2, y)), atol=1e-12)


class TestGPTraining:
    def test_train_and_roundtrip(self, tmp_path):
        q_p, q_s = smooth_pairs(n=100)
        model = train_gp(q_p, q_s, num_steps=150)
        path = str(tmp_path / "gp.npz")
        save_gp(model, path)
        m2 = load_gp(path)
        y = jnp.asarray(q_p[5] + 0.01)
        np.testing.assert_allclose(np.asarray(gp_predict(model, y)),
                                   np.asarray(gp_predict(m2, y)),
                                   atol=1e-12)


class TestDataUtils:
    def test_random_split(self):
        rng = np.random.default_rng(0)
        data = np.arange(100).reshape(20, 5)
        a, b = random_split(data, 0.75, rng)
        assert a.shape == (15, 5) and b.shape == (5, 5)
        combined = np.vstack([a, b])
        assert set(map(tuple, combined)) == set(map(tuple, data))
