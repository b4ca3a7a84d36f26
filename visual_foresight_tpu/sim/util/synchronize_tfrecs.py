"""Background record sync.

The reference used a ray remote task solely to rsync ``/result`` to a master
node every 10 s (``visual_mpc/sim/util/synchronize_tfrecs.py:7-18``); a plain
daemon thread shelling out to rsync (or copytree fallback) provides the same
capability without a cluster framework.
"""

import os
import shutil
import subprocess
import threading
import time


def _sync_once(src, dst):
    if shutil.which('rsync'):
        subprocess.run(['rsync', '-a', src.rstrip('/') + '/', dst], check=False)
    else:
        os.makedirs(dst, exist_ok=True)
        shutil.copytree(src, dst, dirs_exist_ok=True)


def start_sync_thread(agent_params, interval=10.0):
    """Start a daemon thread syncing the agent's data_save_dir to
    ``master_datadir`` every ``interval`` seconds; returns a stop Event."""
    src = agent_params.get('data_save_dir', '/result/')
    dst = agent_params['master_datadir']
    stop = threading.Event()

    def loop():
        while not stop.is_set():
            try:
                _sync_once(src, dst)
            except Exception as e:  # sync must never kill collection
                print('sync error:', e)
            stop.wait(interval)
        _sync_once(src, dst)  # final flush

    threading.Thread(target=loop, daemon=True).start()
    return stop
