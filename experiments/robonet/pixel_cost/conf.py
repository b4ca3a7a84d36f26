"""Predictor serving configuration for the RoboNet pixel-cost benchmark
(capability of reference ``experiments/robonet/pixel_cost/conf.py`` — the
RoboNet-trained model is produced by ``training/train_predictor.py`` over the
hdf5 ingestion path, see ``data/robonet_hdf5.py``)."""

import os

from visual_foresight_tpu.prediction.predictor import TPUPredictor

current_dir = os.path.dirname(os.path.realpath(__file__))
_model_root = os.environ.get('VMPC_MODEL_DIR', current_dir + '/modeldata')

configuration = {
    'predictor_class': TPUPredictor,
    'model_path': _model_root,
    'sequence_length': 13,
    'context_frames': 2,
    'run_batch_size': 200,
    'sdim': 5,
    'adim': 4,
    'img_dims': [48, 64],
    'ndesig': 1,
    'ncam': 1,
}
