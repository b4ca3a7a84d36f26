"""Image helpers on the agent's hot path.

``resize_store`` is the only image resize on the rollout hot loop
(reference ``visual_mpc/utils/im_utils.py:6-15``): it area-resizes each camera
frame into the time-indexed uint8 cache. gif/mp4 writers are used by savers and
env recorders; we use imageio instead of moviepy (not in this image).
"""

import os

import cv2
import imageio
import numpy as np


def resize_store(t, target_array, input_array):
    """Resize ncam frames into ``target_array[t]`` (INTER_AREA, matching the
    reference's downsample quality choice)."""
    target_h, target_w = target_array.shape[2:4]
    if (target_h, target_w) == input_array.shape[1:3]:
        target_array[t] = input_array
    else:
        for cam in range(input_array.shape[0]):
            target_array[t, cam] = cv2.resize(
                input_array[cam], (target_w, target_h), interpolation=cv2.INTER_AREA)


def _ensure_parent(filename):
    parent = os.path.dirname(filename)
    if parent and not os.path.exists(parent):
        os.makedirs(parent, exist_ok=True)


def npy_to_gif(im_list, filename, fps=4):
    _ensure_parent(filename)
    if not filename.endswith('.gif'):
        filename = filename + '.gif'
    imageio.mimsave(filename, [np.asarray(f, dtype=np.uint8) for f in im_list],
                    duration=1000.0 / fps, loop=0)


def npy_to_mp4(im_list, filename, fps=4):
    _ensure_parent(filename)
    if not filename.endswith('.mp4'):
        filename = filename + '.mp4'
    writer = imageio.get_writer(filename, fps=fps)
    for frame in im_list:
        writer.append_data(np.asarray(frame, dtype=np.uint8))
    writer.close()
