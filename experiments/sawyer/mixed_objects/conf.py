"""Two-view predictor serving configuration, mixed towel/hard-object model
(capability of reference ``experiments/sawyer/mixed_objects/conf.py``)."""

import os

from visual_foresight_tpu.prediction.predictor import TPUPredictor

current_dir = os.path.dirname(os.path.realpath(__file__))
_model_root = os.environ.get('VMPC_MODEL_DIR', current_dir + '/modeldata')

configuration = {
    'predictor_class': TPUPredictor,
    'model_path': _model_root,
    'sequence_length': 15,
    'context_frames': 2,
    'run_batch_size': 150,
    'sdim': 8,
    'adim': 4,
    'img_dims': [48, 64],
    'ndesig': 2,
    'ncam': 2,
}
