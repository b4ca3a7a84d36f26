"""Predictor serving configuration for the pixel-cost MPC experiment
(capability of reference ``experiments/sim/cartgripper_2d_grasping/pixel_cost/conf.py``
— which pointed TF1 ``setup_predictor`` at a pretrained SAVP graph; here the
same knobs configure the native ``TPUPredictor``)."""

import os

from visual_foresight_tpu.prediction.predictor import TPUPredictor

current_dir = os.path.dirname(os.path.realpath(__file__))
OUT_DIR = current_dir + '/modeldata'

configuration = {
    'predictor_class': TPUPredictor,
    'model_path': os.environ.get('VMPC_MODEL_DIR', OUT_DIR),
    'sequence_length': 15,      # total frames incl. context
    'context_frames': 2,
    'run_batch_size': 200,
    'sdim': 3,
    'adim': 3,
    'img_dims': [48, 64],
    'ndesig': 1,
    'ncam': 1,
}
