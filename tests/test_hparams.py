import numpy as np
import pytest

from visual_foresight_tpu.utils.hparams import HParams


def test_add_and_get():
    hp = HParams(a=1, b='x')
    assert hp.a == 1 and hp.b == 'x'
    hp.add_hparam('c', 2.5)
    assert hp.c == 2.5
    assert 'c' in hp and 'd' not in hp
    assert hp.get('d', 7) == 7


def test_redefine_errors():
    hp = HParams(a=1)
    with pytest.raises(ValueError):
        hp.add_hparam('a', 2)


def test_set_type_check():
    hp = HParams(a=1, b=2.0, c='s', d=True)
    hp.set_hparam('a', 3)
    hp.set_hparam('b', 4)       # int -> float ok
    assert hp.b == 4.0
    hp.set_hparam('d', False)
    with pytest.raises(ValueError):
        hp.set_hparam('c', 3)
    with pytest.raises(ValueError):
        hp.set_hparam('a', 'oops')
    with pytest.raises(KeyError):
        hp.set_hparam('nope', 1)


def test_none_default_accepts_anything():
    hp = HParams(x=None)
    hp.set_hparam('x', [1, 2, 3])
    assert hp.x == [1, 2, 3]


def test_override_from_dict():
    hp = HParams(a=1, b=2.0)
    hp.override_from_dict({'a': 5, 'b': 6})
    assert hp.a == 5 and hp.b == 6.0


def test_numpy_values():
    hp = HParams(arr=np.zeros(3))
    hp.set_hparam('arr', np.ones(4))
    assert hp.arr.shape == (4,)
