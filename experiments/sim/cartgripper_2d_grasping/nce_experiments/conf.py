"""Predictor serving configuration for the NCE-cost experiment
(capability of reference ``experiments/sim/cartgripper_2d_grasping/nce_experiments/conf.py``)."""

import os

from visual_foresight_tpu.prediction.predictor import TPUPredictor

current_dir = os.path.dirname(os.path.realpath(__file__))
OUT_DIR = current_dir + '/modeldata'

configuration = {
    'predictor_class': TPUPredictor,
    'model_path': os.environ.get('VMPC_MODEL_DIR', OUT_DIR),
    'sequence_length': 15,
    'context_frames': 2,
    'run_batch_size': 200,
    'sdim': 3,
    'adim': 3,
    'img_dims': [48, 64],
    'ncam': 1,
}
