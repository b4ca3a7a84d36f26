"""GDN (goal-distance/registration flow net) training configuration
(capability of reference ``experiments/sawyer/registration_experiments/gdnconf.py``
— the TF1 MulltiviewTestGDN training dict becomes the native flow-net
trainer's knobs, ``training/train_gdn.py`` + ``models/gdn.py``)."""

import os

current_dir = os.path.dirname(os.path.realpath(__file__))
OUT_DIR = current_dir + '/modeldata'

configuration = {
    'experiment_name': 'correction',
    # per-view checkpoint dirs consumed by RegisterGtruthController.gdn_path
    'model_path': os.environ.get('VMPC_GDN_DIR', OUT_DIR),
    'output_dir': OUT_DIR,
    'num_iterations': 100000,
    'sequence_length': 8,
    'context_frames': 1,
    'train_val_split': .95,
    'batch_size': 32,
    'learning_rate': 0.001,
    'orig_size': [96, 128],
    'smoothcost': 1e-7,
    'view': 0,
}
