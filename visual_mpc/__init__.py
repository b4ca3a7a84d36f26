"""Compatibility package: the reference framework's import paths.

Existing ``visual_mpc.*`` imports (hparams files, user scripts) resolve to the
TPU-native implementation in ``visual_foresight_tpu``.  A meta-path finder
redirects submodule imports, with the handful of renamed subsystems mapped
explicitly (``video_prediction`` -> ``prediction``).

Example: ``from visual_mpc.policy.cem_controllers import PixelCostController``
works unchanged.
"""

import importlib
import importlib.abc
import importlib.machinery
import sys

_RENAMES = {
    'visual_mpc.video_prediction': 'visual_foresight_tpu.prediction',
    'visual_mpc.video_prediction.pred_util':
        'visual_foresight_tpu.prediction.pred_util',
    'visual_mpc.video_prediction.setup_predictor':
        'visual_foresight_tpu.prediction.predictor',
    'visual_mpc.video_prediction.checkpoint_matcher':
        'visual_foresight_tpu.prediction.checkpoints',
}


class _AliasFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    PREFIX = 'visual_mpc.'

    def _target(self, fullname):
        if fullname in _RENAMES:
            return _RENAMES[fullname]
        return 'visual_foresight_tpu.' + fullname[len(self.PREFIX):]

    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith(self.PREFIX):
            return None
        try:
            importlib.util.find_spec(self._target(fullname))
        except (ImportError, ModuleNotFoundError):
            return None
        return importlib.machinery.ModuleSpec(fullname, self,
                                              is_package=True)

    def create_module(self, spec):
        return importlib.import_module(self._target(spec.name))

    def exec_module(self, module):
        pass


if not any(isinstance(f, _AliasFinder) for f in sys.meta_path):
    sys.meta_path.insert(0, _AliasFinder())

# eagerly expose the common top-level namespaces
from visual_foresight_tpu import agent, envs, policy, sim, utils  # noqa: E402,F401
