"""Vendored real-demonstrator corpus sample: wipe-proof regression data.

``tests/assets/ag_r4s_sample/good`` holds two REAL trajectories collected by
the scripted grasp-transport demonstrator
(``policy/handcrafted/grasp_transport_policy.py``) in the autograsp
cartgripper env — extracted record-for-record from the round-4 campaign
corpus by ``scripts/extract_sample_trajs.py``.  They pin down two things no
synthetic fixture can:

* the END-TO-END record contract of a collection campaign (keys, shapes,
  dtypes as written by ``agent/utils/record_saver.py`` through the TF-free
  codec), as consumed by ``BaseVideoDataset``;
* the demonstrator's grasp-transport signature on real physics — the
  gripper descends below the autograsp latch threshold (reference
  ``envs/mujoco_env/cartgripper_env/autograsp_env.py:43-52`` semantics), an
  object gains height, and the same object is transported in xy.
"""

import os

import numpy as np
import pytest

ASSET = os.path.join(os.path.dirname(__file__), 'assets', 'ag_r4s_sample',
                     'good')


@pytest.fixture(scope='module')
def batch():
    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(ASSET, batch_size=2, hparams_dict={'shuffle': False})
    return {k: np.asarray(ds[k, 'train']) for k in
            ('env/image_view0/encoded', 'env/state', 'env/object_poses',
             'policy/actions', 'desig_pix', 'term_t')}


def test_record_contract(batch):
    assert batch['env/image_view0/encoded'].shape == (2, 30, 48, 64, 3)
    assert batch['env/image_view0/encoded'].dtype == np.uint8
    assert batch['env/state'].shape == (2, 30, 5)
    assert batch['env/object_poses'].shape == (2, 30, 3, 3)
    assert batch['policy/actions'].shape == (2, 30, 4)
    assert batch['desig_pix'].shape[0] == 2
    # images are actual renders, not padding
    assert batch['env/image_view0/encoded'].max() > 100


def test_grasp_transport_signature(batch):
    states = batch['env/state']
    objs = batch['env/object_poses']
    for b in range(objs.shape[0]):
        # descend phase reaches below the autograsp latch threshold
        assert states[b, :, 2].min() < -0.06
        # a grasp was held: some object gained height
        z_gain = objs[b, :, :, 2].max(axis=0) - objs[b, 0, :, 2]
        lifted = z_gain > 0.05
        assert lifted.any()
        # ... and that object was transported in xy ("good" split = the
        # demonstrator completed a pick -> carry -> place)
        xy_disp = np.linalg.norm(objs[b, -1, :, :2] - objs[b, 0, :, :2],
                                 axis=-1)
        assert xy_disp[lifted].max() > 0.1


def test_bad_split_contract():
    """The ``seperate_good`` saver routes failed demos to bad/ with the SAME
    record contract — failure data is part of the training corpus (the
    predictor must model what happens when a grasp misses)."""
    from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
    ds = BaseVideoDataset(os.path.join(os.path.dirname(ASSET), 'bad'),
                          batch_size=2, hparams_dict={'shuffle': False})
    assert np.asarray(ds['env/image_view0/encoded', 'train']).shape == \
        (2, 30, 48, 64, 3)
    assert np.asarray(ds['policy/actions', 'train']).shape == (2, 30, 4)


def test_actions_within_demonstrator_envelope(batch):
    """The scripted policy caps per-step deltas (xy 0.08, z 0.09 + noise,
    10% fully random steps at std<=0.2) — actions in the corpus must sit in
    a bounded envelope, NOT the 0.6-std regime of the random campaigns;
    this is the fact that sets the campaign-time VMPC_STD_LIFT choice."""
    acts = batch['policy/actions']
    assert np.abs(acts[..., :2]).max() < 0.35
    assert np.abs(acts[..., 2]).max() < 0.35
    assert np.percentile(np.abs(acts[..., 2]), 90) < 0.15
