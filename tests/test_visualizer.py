"""Golden tests for the planner HTML visualization
(reference ``visualizer/construct_html.py`` + the async file worker).

The smoke coverage elsewhere only checks that controllers run with
``verbose=False``; these tests pin the artifact CONTENT: well-formed HTML
with the expected rows/cells, gif/png/html files actually landing on disk
through the file worker, and the score histogram rendering.
"""

import os
import time
from collections import OrderedDict

import numpy as np
import pytest

from visual_foresight_tpu.policy.cem_controllers.visualizer.construct_html import (
    HTMLTemplate, fill_template, save_gifs, save_html, save_img)


class _ListWorker:
    """Synchronous stand-in for the async file worker queue."""

    def __init__(self):
        self.messages = []

    def put(self, msg):
        self.messages.append(msg)


def test_fill_template_golden():
    content = OrderedDict()
    content['pred'] = ['rollout_0.gif', 'rollout_1.gif']
    content['scores'] = np.array([0.25, 1.5])
    content['note'] = 7
    html = fill_template(3, 12, content, img_height=96)

    assert html.startswith(HTMLTemplate.HEAD)
    assert html.endswith(HTMLTemplate.TAIL)
    assert '<h3>planning step t=12 CEM iteration 3</h3>' in html
    # one row per key, in insertion order
    rows = html.split('<tr>')[1:]
    assert len(rows) == 3
    assert '<th>pred</th>' in rows[0] and '<th>scores</th>' in rows[1]
    # strings render as <img> cells at the requested height
    assert '<td><img src="rollout_0.gif" height="96"></td>' in rows[0]
    assert '<td><img src="rollout_1.gif" height="96"></td>' in rows[0]
    # floats print with 4 decimals; ints verbatim
    assert '<td>0.2500</td>' in rows[1] and '<td>1.5000</td>' in rows[1]
    assert '<td>7</td>' in rows[2]
    # nothing else sneaks in as an image
    assert html.count('<img') == 2


def test_artifacts_land_on_disk_through_file_worker(tmp_path):
    from visual_foresight_tpu.agent.utils.file_saver import start_file_worker

    queue = start_file_worker()
    proc = queue._join_proc
    try:
        folder = str(tmp_path / 'planning_3_itr_2')
        frames = [(np.full((8, 12, 3), c, np.uint8)) for c in (0, 128, 255)]
        gif_paths = save_gifs(queue, folder, 'pred', [frames, frames[::-1]])
        img_path = save_img(queue, folder, 'start', frames[0])
        html = fill_template(2, 3, OrderedDict(
            [('pred', gif_paths), ('start', img_path)]))
        save_html(queue, folder + '/plan.html', html)
    finally:
        queue.put(None)
        proc.join(timeout=20)

    assert gif_paths == ['pred_0.gif', 'pred_1.gif']
    assert img_path == 'start.png'
    for rel in gif_paths + [img_path, 'plan.html']:
        full = os.path.join(str(tmp_path / 'planning_3_itr_2'), rel)
        assert os.path.isfile(full), 'missing artifact {}'.format(rel)
        assert os.path.getsize(full) > 0
    written = open(os.path.join(str(tmp_path / 'planning_3_itr_2'),
                                'plan.html')).read()
    # the worker's text writer appends a trailing newline
    assert written.rstrip('\n') == html.rstrip('\n')
    # the png round-trips with the right content
    import cv2
    img = cv2.imread(os.path.join(str(tmp_path / 'planning_3_itr_2'),
                                  'start.png'))
    assert img.shape == (8, 12, 3) and img.max() == 0


def test_score_histogram_renders(tmp_path):
    from visual_foresight_tpu.policy.cem_controllers.visualizer.plot_helper import (
        plot_score_hist)
    img = plot_score_hist(np.random.RandomState(0).rand(64),
                          tick_value=0.4, tick_label='expert')
    img = np.asarray(img)
    assert img.ndim == 3 and img.shape[2] in (3, 4)
    assert img.std() > 0  # actually drew something
