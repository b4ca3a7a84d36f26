"""Merge the good/ and bad/ halves of one or more separated-record collections.

A collection run with ``seperate_good: True`` writes two independent record
trees (``records/good``, ``records/bad``), each with train/val/test splits
and a ``manifest.pkl``.  Predictor training wants ALL trajectories (failed
grasps carry most of the contact dynamics), so this tool hardlinks every
shard into one merged tree with a disambiguating prefix and copies one
manifest (all halves share the same schema by construction).

Multiple records dirs may be given (e.g. a random-policy campaign plus a
scripted-demonstrator campaign over the same env): shards are prefixed by
source index so the merged tree stays collision-free.

``--boost-good N`` additionally links every good/ train shard N extra
times (``goodboost{i}_`` prefixes): random autograsp collection succeeds on
only ~5-10 % of trajectories, so the transport dynamics the planner needs
(object moves WITH the gripper) are rare in the natural mixture; shard-level
oversampling shifts the training distribution without touching the reader.

Usage::

    python scripts/merge_record_splits.py <records dir> [<records dir> ...]
        [--boost-good N] [--out NAME] [--out-dir PATH]
"""

import argparse
import os
import shutil


def merge(records_dirs, boost_good=0, out_name='all', out_dir=None):
    if isinstance(records_dirs, str):
        records_dirs = [records_dirs]
    out = out_dir or os.path.join(records_dirs[0], out_name)
    for split in ('train', 'val', 'test'):
        os.makedirs(os.path.join(out, split), exist_ok=True)
    n = 0
    manifest_src = None
    for si, records_dir in enumerate(records_dirs):
        halves = [d for d in ('good', 'bad')
                  if os.path.isdir(os.path.join(records_dir, d))]
        if not halves:
            raise SystemExit('no good/ or bad/ under {}'.format(records_dir))
        src_tag = 'src{}_'.format(si) if len(records_dirs) > 1 else ''
        for half in halves:
            for split in ('train', 'val', 'test'):
                src_dir = os.path.join(records_dir, half, split)
                if not os.path.isdir(src_dir):
                    continue
                for name in sorted(os.listdir(src_dir)):
                    if not name.endswith('.tfrecords'):
                        continue
                    src = os.path.join(src_dir, name)
                    dst = os.path.join(out, split, '{}{}_{}_{}'.format(
                        src_tag, half, split, name))
                    if not os.path.exists(dst):
                        os.link(src, dst)
                    n += 1
                    if half == 'good' and split == 'train':
                        for i in range(boost_good):
                            dst = os.path.join(
                                out, split, '{}goodboost{}_{}_{}'.format(
                                    src_tag, i, split, name))
                            if not os.path.exists(dst):
                                os.link(src, dst)
                            n += 1
        if manifest_src is None:
            manifest_src = os.path.join(records_dir, halves[0])
    for mf in ('manifest.pkl', 'manifest.txt'):
        src = os.path.join(manifest_src, mf)
        if os.path.isfile(src):
            shutil.copy(src, os.path.join(out, mf))
    print('merged {} shards from {} source(s) into {}'.format(
        n, len(records_dirs), out))
    return out


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('records_dirs', nargs='+')
    ap.add_argument('--boost-good', type=int, default=0,
                    help='link each good/ TRAIN shard this many extra times')
    ap.add_argument('--out', default='all',
                    help='output subdir name (under the first records dir)')
    ap.add_argument('--out-dir', default=None,
                    help='absolute output dir (overrides --out)')
    a = ap.parse_args()
    merge(a.records_dirs, a.boost_good, a.out, a.out_dir)
