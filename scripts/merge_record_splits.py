"""Merge the good/ and bad/ halves of a separated-record collection.

A collection run with ``seperate_good: True`` writes two independent record
trees (``records/good``, ``records/bad``), each with train/val/test splits
and a ``manifest.pkl``.  Predictor training wants ALL trajectories (failed
grasps carry most of the contact dynamics), so this tool hardlinks every
shard into ``records/all`` with a disambiguating prefix and copies one
manifest (both halves share the same schema by construction).

Usage::

    python scripts/merge_record_splits.py <records dir containing good/ and bad/>
"""

import os
import shutil
import sys


def merge(records_dir):
    out = os.path.join(records_dir, 'all')
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
                dst = os.path.join(out, split,
                                   '{}_{}_{}'.format(half, split, name))
                if not os.path.exists(dst):
                    os.link(os.path.join(src_dir, name), dst)
                n += 1
    for mf in ('manifest.pkl', 'manifest.txt'):
        src = os.path.join(records_dir, halves[0], mf)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(out, mf))
    print('merged {} shards from {} into {}'.format(n, '+'.join(halves), out))
    return out


if __name__ == '__main__':
    merge(sys.argv[1])
