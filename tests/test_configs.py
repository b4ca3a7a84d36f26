"""Every shipped experiment/data-collection config must load: files exporting
``config`` follow the sim/run.py contract (agent/policy/index range), files
exporting ``configuration`` follow the predictor-serving conf contract."""

import glob
import importlib.machinery
import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _all_config_files():
    out = []
    for root in ('data_collection', 'experiments'):
        out.extend(glob.glob(os.path.join(REPO, root, '**', '*.py'),
                             recursive=True))
    return sorted(out)


ALL_FILES = _all_config_files()


def _load(path):
    loader = importlib.machinery.SourceFileLoader(
        'cfg_test_{}'.format(abs(hash(path))), path)
    spec = importlib.util.spec_from_loader(loader.name, loader)
    mod = importlib.util.module_from_spec(spec)
    loader.exec_module(mod)
    return mod


def test_config_tree_is_populated():
    # the reference ships 59 config files; the port must have real breadth
    assert len(ALL_FILES) >= 45, ALL_FILES


@pytest.mark.parametrize('path', ALL_FILES,
                         ids=lambda p: os.path.relpath(p, REPO))
def test_config_loads(path):
    mod = _load(path)
    has_run_config = hasattr(mod, 'config')
    has_serving_conf = hasattr(mod, 'configuration')
    assert has_run_config or has_serving_conf, \
        'config file exports neither config nor configuration'

    if has_run_config:
        config = mod.config
        agent = config['agent']
        assert isinstance(agent['type'], type)
        env_cls, env_params = agent['env']
        assert isinstance(env_cls, type) and isinstance(env_params, dict)
        assert 'type' in config['policy']
        assert config['end_index'] >= config['start_index']
    else:
        configuration = mod.configuration
        assert 'model_path' in configuration
        assert configuration.get('context_frames', 1) >= 1


def _benchmark_config_files():
    return sorted(glob.glob(os.path.join(REPO, 'benchmarks', '*',
                                         'hparams.py')))


@pytest.mark.parametrize('path', _benchmark_config_files(),
                         ids=lambda p: os.path.relpath(p, REPO))
def test_benchmark_config_hparams_validate(path):
    """Benchmark configs must survive the strict typed-override pass
    (overriding with the default raises by design, list/str mismatches
    raise) WITHOUT building a predictor — controller __init__ applies
    overrides before any checkpoint load, so this is exactly the layer a
    campaign launch would die in."""
    mod = _load(path)
    pol = dict(mod.config['policy'])
    ptype = pol.pop('type')
    inst = object.__new__(ptype)
    inst._hp = ptype._default_hparams(inst)
    ptype._override_defaults(inst, pol)   # raises on any bad override
