"""Cosine-warm-restarts schedule parity vs torch's scheduler stepped per epoch
(reference train.py:121-123, 154)."""

import numpy as np
import pytest

from twinvoice_tpu.train.schedule import cosine_warm_restarts, warm_restart_position


def torch_lrs(base_lr=1e-3, t0=10, t_mult=2, epochs=50):
    import torch

    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.AdamW([p], lr=base_lr)
    sched = torch.optim.lr_scheduler.CosineAnnealingWarmRestarts(opt, T_0=t0, T_mult=t_mult)
    out = []
    for _ in range(epochs):
        out.append(opt.param_groups[0]["lr"])  # lr used during this epoch
        sched.step()
    return out


@pytest.mark.parametrize("t_mult", [1, 2, 3])
def test_schedule_matches_torch(t_mult):
    sched = cosine_warm_restarts(1e-3, 10, t_mult)
    golden = torch_lrs(1e-3, 10, t_mult, 50)
    got = [sched(e) for e in range(50)]
    np.testing.assert_allclose(got, golden, rtol=1e-6, atol=1e-12)


def test_restart_boundaries():
    # cycles of length 10, 20, 40 → restarts at epochs 10 and 30
    assert warm_restart_position(0, 10, 2) == (0, 10)
    assert warm_restart_position(9, 10, 2) == (9, 10)
    assert warm_restart_position(10, 10, 2) == (0, 20)
    assert warm_restart_position(29, 10, 2) == (19, 20)
    assert warm_restart_position(30, 10, 2) == (0, 40)
