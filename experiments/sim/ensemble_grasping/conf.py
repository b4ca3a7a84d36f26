"""Two-view ensemble predictor serving configuration
(capability of reference ``experiments/sim/ensemble_grasping/conf.py`` —
which listed per-member TF1 SAVP checkpoints; here the members are stacked
flax param pytrees served by one vmapped ``TPUPredictor`` program, see
``variants/ensemble_vidpred.py``)."""

import os

from visual_foresight_tpu.prediction.predictor import TPUPredictor

current_dir = os.path.dirname(os.path.realpath(__file__))
_model_root = os.environ.get('VMPC_MODEL_DIR', current_dir + '/modeldata')

configuration = {
    'predictor_class': TPUPredictor,
    # one checkpoint dir per ensemble member
    'model_path': [_model_root + '/member0', _model_root + '/member1'],
    'sequence_length': 15,
    'context_frames': 2,
    'run_batch_size': 400,
    'sdim': 5,
    'adim': 4,
    'img_dims': [48, 64],
    'ndesig': 1,
    'ncam': 2,
}
