"""Trainer harness: checkpoints (last + protected best), EMA eval, find_lr.

Pins the round-2 trainer-fidelity fixes: the best-metric checkpoint lives in
its own top-1 manager (later periodic saves can never evict it), evaluate
reads the EMA parameters (what sampling ships), and find_lr produces a sweep
artifact like the reference's find_lr mode (endiffusion/train.py:93-125).
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hierdiff_tpu.config import load_config
from hierdiff_tpu.train.trainer import Trainer


def quad_loss(params, batch, rng):
    pred = batch["x"] @ params["w"]
    loss = jnp.mean((pred - batch["y"]) ** 2)
    return loss, {}


def data_iter(seed=0, batch=16):
    rng = np.random.default_rng(seed)
    w_true = np.array([1.0, -2.0, 0.5, 3.0], np.float32)
    while True:
        x = rng.standard_normal((batch, 4)).astype(np.float32)
        yield {"x": jnp.asarray(x), "y": jnp.asarray(x @ w_true)}


@pytest.fixture()
def cfg(tmp_path):
    return load_config(None, [
        f"train.workdir={tmp_path}/run", "train.max_steps=30",
        "train.eval_every=10", "train.checkpoint_every=10",
        "train.log_every=10", "optim.lr=0.05", "optim.ema_decay=0.9"])


def make_trainer(cfg, **kw):
    params = {"w": jnp.zeros(4)}
    return Trainer(cfg, quad_loss, params, data_parallel=False, **kw)


def test_fit_saves_last_and_protected_best(cfg):
    tr = make_trainer(cfg, tensorboard=False)
    tr.fit(data_iter(), eval_iter=lambda: itertools.islice(data_iter(seed=1), 2))
    # last-k manager has the periodic saves; best manager holds exactly one
    assert tr.mngr.latest_step() == 30
    best_steps = tr.best_mngr.all_steps()
    assert len(best_steps) == 1
    # the monitored loss decreases, so the best is the LAST eval step —
    # and later periodic saves (20, 30) did not evict it from its own dir
    assert best_steps[0] in (10, 20, 30)
    assert (tr.workdir / "metrics.csv").exists()
    assert (tr.workdir / "config.json").exists()


def test_resume_restores_step_and_params(cfg):
    tr = make_trainer(cfg, tensorboard=False)
    tr.fit(data_iter())
    w_trained = np.asarray(tr.state.params["w"])
    tr2 = make_trainer(cfg, tensorboard=False)
    assert tr2.try_resume()
    assert int(tr2.state.step) == 30
    np.testing.assert_allclose(np.asarray(tr2.state.params["w"]), w_trained)
    assert np.asarray(tr2.state.ema_params["w"]).shape == (4,)


def test_evaluate_uses_ema_params(cfg):
    tr = make_trainer(cfg, tensorboard=False)
    for _ in range(5):
        tr.state, _ = tr.step_fn(tr.state, next(data_iter()), jax.random.PRNGKey(0))
    batch = next(data_iter(seed=2))
    ev_ema = tr.evaluate(iter([batch]), jax.random.PRNGKey(0))
    tr.eval_on_ema = False
    ev_raw = tr.evaluate(iter([batch]), jax.random.PRNGKey(0))
    # EMA lags the optimized params after a few steps -> different loss
    assert abs(ev_ema["loss"] - ev_raw["loss"]) > 1e-6


def test_find_lr_writes_sweep_and_suggests(cfg):
    tr = make_trainer(cfg, tensorboard=False)
    lr = tr.find_lr(data_iter(), n_steps=40, min_lr=1e-5, max_lr=10.0)
    assert np.isfinite(lr) and 1e-5 <= lr <= 10.0
    rows = (tr.workdir / "lr_find.csv").read_text().strip().splitlines()
    assert rows[0] == "lr,loss" and len(rows) > 5


def test_sampling_loader_prefers_best(cfg):
    from hierdiff_tpu.sampling.cli import load_checkpoint_params

    tr = make_trainer(cfg, tensorboard=False)
    tr.fit(data_iter(), eval_iter=lambda: itertools.islice(data_iter(seed=1), 2))
    best_step = tr.best_mngr.all_steps()[0]
    params, _, step = load_checkpoint_params(str(tr.workdir))
    assert step == best_step
    params, _, step = load_checkpoint_params(str(tr.workdir), prefer_best=False)
    assert step == 30
