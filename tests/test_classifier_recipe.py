"""Goal-conditioned classifier training-recipe tests (round-3 fix for the
position-blind round-2 labels; reference shape:
``experiments/sawyer/towel_classifier/conf.py:18``).

The quality gate trains on the synthetic goal-matching task (success iff
the frame's object sits at THIS goal's cell) where a position-blind
classifier cannot beat chance, then checks the self-supervised label
generator's pairing/weighting logic on real trajectory tensors."""

import types

import numpy as np
import pytest

from visual_foresight_tpu.training.train_classifier import (
    goal_conditioned_batches, synthetic_goal_batches, train_classifier)


def _args(**kw):
    ns = types.SimpleNamespace(
        data_dir='', model_dir='', steps=250, batch_size=32, lr=1e-3,
        image_height=32, image_width=32, camera=0, seed=0, log_every=100,
        label_mode='goal', ambiguous_pixel_diff=0.01)
    for k, v in kw.items():
        setattr(ns, k, v)
    return ns


def test_goal_conditioned_classifier_learns_position():
    """The recipe must solve the task the round-2 lift labels provably
    cannot: success is a function of WHERE the goal is."""
    history, _ = train_classifier(_args())
    assert history[-1]['acc'] > 0.85, history[-1]


def test_synthetic_goal_batches_label_semantics():
    gen = synthetic_goal_batches(_args(), seed=3)
    cur, goal, labels, weights = next(gen)
    assert cur.shape == goal.shape == (32, 32, 32, 3)
    assert np.all(weights == 1.0)
    # positives share the bright cell; negatives don't (quantize the argmax
    # to the 12x16 cell grid — it can land anywhere inside the 8px square)
    for i in range(8):
        bright_cur = np.unravel_index(cur[i].sum(-1).argmax(), (32, 32))
        bright_goal = np.unravel_index(goal[i].sum(-1).argmax(), (32, 32))
        cell = lambda rc: (rc[0] // 12, rc[1] // 16)
        assert (cell(bright_cur) == cell(bright_goal)) == \
            bool(labels[i] > 0.5)


def test_goal_conditioned_batches_from_records(tmp_path):
    """Self-supervised pairing over a tiny written dataset: positives come
    from the same trajectory's tail, ambiguous negatives get weight 0."""
    from visual_foresight_tpu.agent.utils.traj_saver import GeneralAgentSaver

    rng = np.random.RandomState(0)
    T, H, W = 4, 16, 16
    saver = GeneralAgentSaver(str(tmp_path), T, seperate_good=False,
                              traj_per_file=4, split=(1.0, 0.0, 0.0))
    for i in range(8):
        imgs = np.zeros((T + 1, 1, H, W, 3), np.uint8)
        col = 2
        for t in range(T + 1):
            imgs[t, 0, 4:8, col:col + 4] = 255
            if i % 2 == 0:       # half the trajectories actually move
                col += 2
        agent_data = {'term_t': T - 1, 'traj_ok': True}
        obs = {'images': imgs,
               'state': rng.randn(T + 1, 2).astype(np.float64)}
        policy_out = [{'actions': rng.randn(2)} for _ in range(T)]
        saver.save_traj(agent_data, obs, policy_out)
    saver.flush()

    args = _args(data_dir=str(tmp_path), batch_size=8,
                 image_height=H, image_width=W)
    cur, goal, labels, weights = next(goal_conditioned_batches(args, seed=1))
    assert cur.shape == (8, H, W, 3)
    assert set(np.unique(labels)) <= {0.0, 1.0}
    # every positive pair really does match (both drawn from the traj tail)
    pos = labels > 0.5
    if pos.any():
        assert np.abs(cur[pos] - goal[pos]).mean() < 0.25
    # ambiguous negatives (frame == goal) are weight-0, real ones weight-1
    neg = labels < 0.5
    for i in np.where(neg)[0]:
        expect = 0.0 if np.abs(cur[i] - goal[i]).mean() < 0.01 else 1.0
        assert weights[i] == expect
