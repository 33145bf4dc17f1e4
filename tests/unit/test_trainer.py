"""Training-loop behavior on a tiny model + synthetic data (BASELINE config 3
semantics, scaled down for the 1-CPU test box)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from twinvoice_tpu.config import Config, TrainConfig, UNetConfig, replace
from twinvoice_tpu.data.dataset import synthetic_dataset
from twinvoice_tpu.train import trainer, checkpoint as ckpt
from twinvoice_tpu.train.trainer import TrainState, make_optimizer


TINY = UNetConfig(base_width=4)


def tiny_config(tmp_path, epochs=2):
    return Config(
        model=TINY,
        train=TrainConfig(
            batch_size=4,
            epochs=epochs,
            checkpoint_dir=str(tmp_path / "ckpts"),
            visualize_dir=str(tmp_path / "vis"),
            visualize=True,
        ),
    )


def test_fit_reduces_loss_and_checkpoints(tmp_path):
    ds = synthetic_dataset(n=8, size=32)
    cfg = tiny_config(tmp_path, epochs=3)
    state, history = trainer.fit(ds, cfg, log=lambda *_: None)
    assert len(history) == 3
    assert history[-1]["loss"] < history[0]["loss"]  # it learns
    assert state.epoch == 3
    # best + latest checkpoints exist; visualize dumps exist (train.py:65-87 parity)
    assert ckpt.has_checkpoint(os.path.join(cfg.train.checkpoint_dir, "best"))
    assert ckpt.has_checkpoint(os.path.join(cfg.train.checkpoint_dir, "latest"))
    vis = os.listdir(cfg.train.visualize_dir)
    assert any(f.endswith("_img.png") for f in vis)
    assert any(f.endswith("_pred.png") for f in vis)
    assert any(f.endswith("_true.png") for f in vis)


def test_resume_continues_from_epoch(tmp_path):
    ds = synthetic_dataset(n=8, size=32)
    cfg = tiny_config(tmp_path, epochs=2)
    state1, h1 = trainer.fit(ds, cfg, log=lambda *_: None)

    cfg2 = replace(cfg, train=replace(cfg.train, epochs=3))
    state2, h2 = trainer.fit(
        ds, cfg2, resume_dir=os.path.join(cfg.train.checkpoint_dir, "latest"),
        log=lambda *_: None,
    )
    assert [r["epoch"] for r in h2] == [3]  # only the remaining epoch ran
    assert state2.epoch == 3


def test_checkpoint_roundtrip(tmp_path):
    from twinvoice_tpu.models.unet import init_unet

    params, bn = init_unet(jax.random.key(0), TINY)
    opt = make_optimizer(TrainConfig())
    state = TrainState(params, bn, opt.init(params), epoch=7, best_loss=0.25)
    ckpt.save(str(tmp_path / "c"), state)

    params2, bn2 = init_unet(jax.random.key(1), TINY)  # different values
    state2 = TrainState(params2, bn2, opt.init(params2))
    state2 = ckpt.restore(str(tmp_path / "c"), state2)
    assert state2.epoch == 7 and state2.best_loss == 0.25
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(state2.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_lr_follows_schedule(tmp_path):
    ds = synthetic_dataset(n=4, size=32)
    cfg = tiny_config(tmp_path, epochs=2)
    _, history = trainer.fit(ds, cfg, log=lambda *_: None)
    from twinvoice_tpu.train.schedule import cosine_warm_restarts

    sched = cosine_warm_restarts(cfg.train.lr, 10, 2)
    assert history[0]["lr"] == pytest.approx(sched(0))
    assert history[1]["lr"] == pytest.approx(sched(1))


def test_remat_train_step_matches_plain():
    """cfg.remat=True must change memory behavior only: identical loss and
    near-identical grads (XLA refusion may differ in the last float bits;
    Adam would amplify those, so compare grads, not post-update params)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from twinvoice_tpu.config import TrainConfig, UNetConfig
    from twinvoice_tpu.models.unet import init_unet, unet_apply
    from twinvoice_tpu.train.losses import invoice_loss

    mcfg = UNetConfig(base_width=8)
    tcfg = TrainConfig(batch_size=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)), jnp.float32)
    y = jnp.asarray((rng.uniform(size=(2, 32, 32, 3)) > 0.8), jnp.float32)
    params, bn = init_unet(jax.random.key(0), mcfg)

    def grads_for(remat):
        def loss_fn(p):
            logits, _ = unet_apply(p, bn, x, cfg=mcfg, train=True,
                                   remat=remat)
            return invoice_loss(logits, y, tcfg.loss)

        return jax.jit(jax.value_and_grad(loss_fn))(params)

    (l0, g0), (l1, g1) = grads_for(False), grads_for(True)
    assert np.isclose(float(l0), float(l1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-4, atol=1e-6),
        g0, g1,
    )


def test_prefetch_matches_synchronous(tmp_path):
    """Async prefetch + deferred loss sync must not change training math:
    same data order (one shared rng stream), bit-same loss history."""
    ds = synthetic_dataset(n=8, size=32)
    base = tiny_config(tmp_path, epochs=2)
    runs = {}
    for pf in (0, 2):
        cfg = replace(base, train=replace(
            base.train, prefetch=pf, visualize=False,
            checkpoint_dir=str(tmp_path / f"ck{pf}")))
        _, history = trainer.fit(ds, cfg, log=lambda *_: None)
        runs[pf] = [h["loss"] for h in history]
    np.testing.assert_allclose(runs[0], runs[2], rtol=1e-6)


def test_sync_every_bounds_dispatch(tmp_path):
    ds = synthetic_dataset(n=8, size=32)
    cfg = tiny_config(tmp_path, epochs=1)
    cfg = replace(cfg, train=replace(cfg.train, sync_every=1, visualize=False))
    _, history = trainer.fit(ds, cfg, log=lambda *_: None)
    assert len(history) == 1 and np.isfinite(history[0]["loss"])
