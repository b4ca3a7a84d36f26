"""Predictor serving configuration for the offline towel-classifier run
(capability of reference ``experiments/offline_exp/towel_classifier/conf.py``)."""

import os

from visual_foresight_tpu.prediction.predictor import TPUPredictor

current_dir = os.path.dirname(os.path.realpath(__file__))
_model_root = os.environ.get('VMPC_MODEL_DIR', current_dir + '/modeldata')

configuration = {
    'predictor_class': TPUPredictor,
    'model_path': _model_root,
    'sequence_length': 15,
    'context_frames': 2,
    'run_batch_size': 50,
    'sdim': 8,
    'adim': 4,
    'img_dims': [48, 64],
    'ncam': 1,
}
