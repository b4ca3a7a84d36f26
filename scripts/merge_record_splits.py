"""Merge the good/ and bad/ halves of a separated-record collection.

A collection run with ``seperate_good: True`` writes two independent record
trees (``records/good``, ``records/bad``), each with train/val/test splits
and a ``manifest.pkl``.  Predictor training wants ALL trajectories (failed
grasps carry most of the contact dynamics), so this tool hardlinks every
shard into ``records/all`` with a disambiguating prefix and copies one
manifest (both halves share the same schema by construction).

``--boost-good N`` additionally links every good/ train shard N extra
times (``goodboost{i}_`` prefixes): random autograsp collection succeeds on
only ~5-10 % of trajectories, so the transport dynamics the planner needs
(object moves WITH the gripper) are rare in the natural mixture; shard-level
oversampling shifts the training distribution without touching the reader.

Usage::

    python scripts/merge_record_splits.py <records dir> [--boost-good N] [--out NAME]
"""

import argparse
import os
import shutil


def merge(records_dir, boost_good=0, out_name='all'):
    out = os.path.join(records_dir, out_name)
    halves = [d for d in ('good', 'bad')
              if os.path.isdir(os.path.join(records_dir, d))]
    if not halves:
        raise SystemExit('no good/ or bad/ under {}'.format(records_dir))
    for split in ('train', 'val', 'test'):
        os.makedirs(os.path.join(out, split), exist_ok=True)
    n = 0
    for half in halves:
        for split in ('train', 'val', 'test'):
            src_dir = os.path.join(records_dir, half, split)
            if not os.path.isdir(src_dir):
                continue
            for name in sorted(os.listdir(src_dir)):
                if not name.endswith('.tfrecords'):
                    continue
                src = os.path.join(src_dir, name)
                dst = os.path.join(out, split,
                                   '{}_{}_{}'.format(half, split, name))
                if not os.path.exists(dst):
                    os.link(src, dst)
                n += 1
                if half == 'good' and split == 'train':
                    for i in range(boost_good):
                        dst = os.path.join(
                            out, split,
                            'goodboost{}_{}_{}'.format(i, split, name))
                        if not os.path.exists(dst):
                            os.link(src, dst)
                        n += 1
    for mf in ('manifest.pkl', 'manifest.txt'):
        src = os.path.join(records_dir, halves[0], mf)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(out, mf))
    print('merged {} shards from {} into {}'.format(n, '+'.join(halves), out))
    return out


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('records_dir')
    ap.add_argument('--boost-good', type=int, default=0,
                    help='link each good/ TRAIN shard this many extra times')
    ap.add_argument('--out', default='all', help='output subdir name')
    a = ap.parse_args()
    merge(a.records_dir, a.boost_good, a.out)
