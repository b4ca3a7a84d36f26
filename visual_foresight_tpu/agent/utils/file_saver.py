"""Async file-writing worker.

A background process drains a manager queue of
``('path'|'txt_file'|'mov'|'img', ...)`` tuples so gif/html/img writes never
block the rollout loop (reference ``visual_mpc/agent/utils/file_saver.py:9-53``).
"""

import logging
import os
from multiprocessing import Manager, Process

import cv2
import imageio
import numpy as np


def start_file_worker():
    manager = Manager()
    file_queue = manager.Queue()
    proc = Process(target=_file_worker, args=(file_queue,), daemon=True)
    proc.start()
    file_queue._join_proc = proc  # join() helper for agent.cleanup()
    return file_queue


def _make_parent_if_needed(file_name):
    parent = os.path.dirname(file_name)
    if parent and not os.path.exists(parent):
        os.makedirs(parent, exist_ok=True)


def _file_worker(file_queue):
    logging.debug('file saver started, PID %d', os.getpid())
    prepend_path = './'
    try:
        data = file_queue.get(True)
    except (EOFError, OSError):
        return  # manager shut down before us (process exit)
    while data is not None:
        kind = data[0]
        if kind == 'path':
            prepend_path = data[1]
            os.makedirs(prepend_path, exist_ok=True)
        elif kind == 'txt_file':
            path = os.path.join(prepend_path, data[1])
            _make_parent_if_needed(path)
            with open(path, 'w') as f:
                f.write(data[2])
                f.write('\n')
        elif kind == 'mov':
            path = os.path.join(prepend_path, data[1])
            _make_parent_if_needed(path)
            fps = data[3] if len(data) == 4 else 4
            writer = imageio.get_writer(path, fps=fps)
            for frame in data[2]:
                writer.append_data(np.asarray(frame, dtype=np.uint8))
            writer.close()
        elif kind == 'img':
            path = os.path.join(prepend_path, data[1])
            _make_parent_if_needed(path)
            cv2.imwrite(path, np.asarray(data[2])[:, :, ::-1])
        try:
            data = file_queue.get(True)
        except (EOFError, OSError):
            return
