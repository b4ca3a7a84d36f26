"""Dataset reading demo (capability of reference ``examples/dataset_reader.py``).

Reads a collected TFRecord dataset and prints batch shapes; writes one tiled
frame grid for visual inspection.

Usage::

    python examples/dataset_reader_demo.py <records_dir> [batch_size]
"""

import sys

import numpy as np

from visual_foresight_tpu.data.dataset_reader import BaseVideoDataset
from visual_foresight_tpu.utils.check_dataset import tile_frames


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    directory = sys.argv[1]
    batch_size = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    ds = BaseVideoDataset(directory, batch_size)
    images = ds['images', 'train']
    states = ds['state', 'train']
    actions = ds['actions', 'train']

    print('images:', images.shape, images.dtype)
    print('states:', states.shape)
    print('actions:', actions.shape)
    print('action stats: mean {} std {}'.format(
        np.round(actions.mean((0, 1)), 4), np.round(actions.std((0, 1)), 4)))

    import cv2
    tiled = tile_frames(images)
    cv2.imwrite('dataset_demo.png', tiled[:, :, ::-1])
    print('wrote dataset_demo.png')
    return 0


if __name__ == '__main__':
    sys.exit(main())
