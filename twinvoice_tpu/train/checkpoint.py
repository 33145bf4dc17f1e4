"""Checkpoint / resume via Orbax.

The reference only ever saves a bare ``state_dict`` on best train loss
(train.py:157-160) and cannot resume — optimizer, scheduler and epoch are
lost. Here the full train state (params, BN stats, optimizer state, epoch,
best loss) round-trips, giving restore-from-latest on preemption
(SURVEY.md §5 checkpoint/resume).

Also provides ``export_pth``-style interop through
:mod:`twinvoice_tpu.port` so reference users can carry weights both ways.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import orbax.checkpoint as ocp

from twinvoice_tpu.config import UNetConfig


def _abs(path):
    return os.path.abspath(path)


def save(path, state):
    """Save a TrainState (from train.trainer) to ``path`` (a directory)."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = {
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "meta": {
            "epoch": np.int64(state.epoch),
            "best_loss": np.float64(state.best_loss),
        },
    }
    ckptr.save(_abs(path), payload, force=True)


def has_checkpoint(path) -> bool:
    return os.path.isdir(_abs(path)) and bool(os.listdir(_abs(path)))


def restore(path, state):
    """Restore into a template TrainState (must have matching tree structure)."""
    ckptr = ocp.PyTreeCheckpointer()
    template = {
        "params": state.params,
        "bn_state": state.bn_state,
        "opt_state": state.opt_state,
        "meta": {"epoch": np.int64(0), "best_loss": np.float64(0.0)},
    }
    got = ckptr.restore(_abs(path), item=template)
    state.params = got["params"]
    state.bn_state = got["bn_state"]
    state.opt_state = got["opt_state"]
    state.epoch = int(got["meta"]["epoch"])
    state.best_loss = float(got["meta"]["best_loss"])
    return state


def save_params(path, params, bn_state):
    """Weights-only checkpoint (inference deployment artifact)."""
    ocp.PyTreeCheckpointer().save(
        _abs(path), {"params": params, "bn_state": bn_state}, force=True
    )


def save_params_npz(path, params, state):
    """Portable flat-npz weights (no device/sharding metadata; loads on any
    backend — orbax checkpoints pin the saving device's sharding)."""
    import jax

    flat = {}
    for prefix, tree in (("p", params), ("s", state)):
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            flat[prefix + "/" + jax.tree_util.keystr(kp)] = np.asarray(leaf)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(path, **flat)


def load_params_npz(path, cfg: UNetConfig = UNetConfig()):
    import jax
    import jax.numpy as jnp

    from twinvoice_tpu.models.unet import init_unet

    tp, ts = init_unet(jax.random.key(0), cfg)
    with np.load(path) as z:
        def rebuild(prefix, tree):
            lp, treedef = jax.tree_util.tree_flatten_with_path(tree)
            leaves = [
                jnp.asarray(z[prefix + "/" + jax.tree_util.keystr(kp)])
                for kp, _ in lp
            ]
            return jax.tree_util.tree_unflatten(treedef, leaves)

        return rebuild("p", tp), rebuild("s", ts)


def restore_params(path, cfg: UNetConfig = UNetConfig()):
    from twinvoice_tpu.models.unet import init_unet

    template_p, template_s = init_unet(jax.random.key(0), cfg)
    got = ocp.PyTreeCheckpointer().restore(
        _abs(path), item={"params": template_p, "bn_state": template_s}
    )
    return got["params"], got["bn_state"]
