"""Optimizer / scheduler semantics vs torch references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from csn_tpu.train.optim import (
    ReduceLROnPlateau, make_lr_schedule, make_optimizer, set_lr,
)

torch = pytest.importorskip("torch")


def run_steps(opt, params, grads_seq, lrs=None):
    state = opt.init(params)
    out = [params]
    for i, g in enumerate(grads_seq):
        if lrs is not None:
            state = set_lr(state, lrs[i])
        updates, state = opt.update(g, state, out[-1])
        out.append(jax.tree_util.tree_map(lambda p, u: p + u, out[-1],
                                          updates))
    return out


def test_sgd_matches_torch():
    w0 = np.array([1.0, -2.0, 0.5], dtype=np.float32)
    grads = [np.array([0.1, -0.2, 0.3], dtype=np.float32),
             np.array([-0.05, 0.4, 0.1], dtype=np.float32),
             np.array([0.2, 0.0, -0.3], dtype=np.float32)]

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.SGD([tw], lr=0.05, momentum=0.9, dampening=0.1,
                           weight_decay=1e-2)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    opt = make_optimizer("SGD", lr=0.05, sgd_momentum=0.9, sgd_dampening=0.1,
                         weight_decay=1e-2)
    traj = run_steps(opt, {"w": jnp.asarray(w0)},
                     [{"w": jnp.asarray(g)} for g in grads])
    np.testing.assert_allclose(np.asarray(traj[-1]["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_adam_matches_torch():
    w0 = np.array([0.3, -1.0], dtype=np.float32)
    grads = [np.array([0.2, -0.1], dtype=np.float32)] * 4

    tw = torch.nn.Parameter(torch.tensor(w0))
    topt = torch.optim.Adam([tw], lr=1e-3, betas=(0.5, 0.999),
                            weight_decay=1e-4)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.tensor(g)
        topt.step()

    opt = make_optimizer("Adam", lr=1e-3, adam_beta1=0.5, adam_beta2=0.999,
                         weight_decay=1e-4)
    traj = run_steps(opt, {"w": jnp.asarray(w0)},
                     [{"w": jnp.asarray(g)} for g in grads])
    np.testing.assert_allclose(np.asarray(traj[-1]["w"]),
                               tw.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_schedules_match_reference_formulas():
    s = make_lr_schedule("StepLR", 0.1, step_size=100, step_gamma=0.5)
    assert abs(s(99) - 0.1) < 1e-9 and abs(s(100) - 0.05) < 1e-9
    s = make_lr_schedule("PolyLR", 0.1, max_iter=1000, poly_power=0.9)
    assert abs(s(500) - 0.1 * (1 - 500 / 1001) ** 0.9) < 1e-9
    s = make_lr_schedule("SquaredLR", 0.1, max_iter=1000)
    assert abs(s(500) - 0.1 * (1 - 500 / 1001) ** 2) < 1e-9
    s = make_lr_schedule("ExpLR", 0.1, exp_gamma=0.9, exp_step_size=10)
    assert abs(s(20) - 0.1 * 0.9 ** 2.0) < 1e-9
    assert make_lr_schedule("ReduceLROnPlateau", 0.1) is None


def test_plateau_matches_torch():
    tw = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([tw], lr=1.0)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, factor=0.5, patience=3, cooldown=2)
    ours = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=3, cooldown=2)

    rng = np.random.default_rng(0)
    losses = list(rng.uniform(0.5, 1.5, size=40))
    losses[5:15] = [2.0] * 10  # plateau stretch
    for loss in losses:
        tsched.step(loss)
        ours.step(loss)
        assert abs(topt.param_groups[0]["lr"] - ours.lr) < 1e-9
