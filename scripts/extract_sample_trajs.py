"""Vendor a few real collected trajectories into the repo as test assets.

Round-3's verdict: every collected artifact lived under ``/root/data`` and
died with the box.  This extracts the first N records of a TFRecord shard
(record-level copy, no decode) plus the split's schema manifest, producing
a self-contained mini-corpus a test can read with ``BaseVideoDataset`` —
real demonstrator/collection output that survives data wipes.

Usage::

    python scripts/extract_sample_trajs.py \
        /root/data/collect/ag_r4s/records/good \
        tests/assets/ag_r4s_sample/good --n 2
"""

import argparse
import glob
import os
import shutil

from visual_foresight_tpu.data.tfrecord_io import (TFRecordWriter,
                                                   tfrecord_iterator)


def extract(src_root, out_root, n, split='train'):
    shards = sorted(glob.glob(os.path.join(src_root, split, '*.tfrecords')))
    if not shards:
        raise SystemExit('no shards under {}/{}'.format(src_root, split))
    os.makedirs(os.path.join(out_root, split), exist_ok=True)
    for name in ('manifest.pkl', 'manifest.txt'):
        src = os.path.join(src_root, name)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_root, name))
    out_path = os.path.join(out_root, split,
                            'traj_0_to_{}.tfrecords'.format(n - 1))
    count = 0
    with TFRecordWriter(out_path) as writer:
        for payload in tfrecord_iterator(shards[0]):
            writer.write(payload)
            count += 1
            if count >= n:
                break
    print('wrote {} records -> {}'.format(count, out_path))
    return count


if __name__ == '__main__':
    p = argparse.ArgumentParser()
    p.add_argument('src_root', help='records split root (has manifest.pkl)')
    p.add_argument('out_root')
    p.add_argument('--n', type=int, default=2)
    p.add_argument('--split', default='train')
    args = p.parse_args()
    extract(args.src_root, args.out_root, args.n, args.split)
