import numpy as np
import pytest

from visual_foresight_tpu.policy import NullPolicy, Policy, get_policy_args


class _ProbePolicy(Policy):
    def __init__(self):
        self._hp = self._default_hparams()

    def act(self, t, i_tr, state, obs, step_data, optional=42):
        return {'actions': np.zeros(2), 'seen': (t, i_tr, optional)}


def test_reflection_fills_args():
    policy = _ProbePolicy()
    obs = {'state': np.arange(3)}
    args = get_policy_args(policy, obs, t=5, i_tr=2, step_data={'foo': 1})
    assert args['t'] == 5 and args['i_tr'] == 2
    assert np.all(args['state'] == np.arange(3))
    assert args['obs'] is obs
    assert args['step_data'] == {'foo': 1}
    assert args['optional'] == 42


def test_missing_required_raises():
    class NeedsGoal(Policy):
        def __init__(self):
            self._hp = self._default_hparams()

        def act(self, must_have):
            return {'actions': np.zeros(1)}

    with pytest.raises(ValueError):
        get_policy_args(NeedsGoal(), {}, 0, 0, None)


def test_null_policy():
    p = NullPolicy({'adim': 4}, {})
    out = p.act()
    assert out['actions'].shape == (4,)
    assert np.all(out['actions'] == 0)


def test_override_identical_to_default_rejected():
    with pytest.raises(ValueError):
        NullPolicy({'adim': 2}, {'wait_for_user': False})
