"""Two-view predictor serving configuration for the Sawyer pixel-cost MPC
(capability of reference ``experiments/sawyer/pixel_cost/conf.py`` — per-view
TF1 SAVP towers become per-camera param pytrees in one ``TPUPredictor``)."""

import os

from visual_foresight_tpu.prediction.predictor import TPUPredictor

current_dir = os.path.dirname(os.path.realpath(__file__))
_model_root = os.environ.get('VMPC_MODEL_DIR', current_dir + '/modeldata')

configuration = {
    'predictor_class': TPUPredictor,
    'model_path': _model_root,       # contains view0/ and view1/ step dirs
    'sequence_length': 15,
    'context_frames': 2,
    'run_batch_size': 200,
    'sdim': 8,
    'adim': 4,
    'img_dims': [48, 64],
    'ndesig': 1,
    'ncam': 2,
}
