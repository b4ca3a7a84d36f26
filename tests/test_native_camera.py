"""Integration test for the native C++ camera node: build artifact publishes
test-pattern frames into shm; the Python client reads distinct frames."""

import os
import subprocess
import time

import numpy as np
import pytest

NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'visual_foresight_tpu', 'native')
BINARY = os.path.join(NATIVE_DIR, 'camera_stream')


@pytest.fixture(scope='module')
def camera_proc():
    if not os.path.isfile(BINARY):
        build = subprocess.run(['make'], cwd=NATIVE_DIR, capture_output=True)
        if build.returncode != 0:
            pytest.skip('camera_stream build failed: {}'.format(
                build.stderr.decode()[-500:]))
    proc = subprocess.Popen(
        [BINARY, '--channel', 'pytest_cam', '--test-pattern',
         '--width', '64', '--height', '48', '--fps', '60'],
        stderr=subprocess.DEVNULL)
    time.sleep(0.5)
    yield proc
    proc.terminate()
    proc.wait(timeout=5)
    try:
        os.remove('/dev/shm/vftpu_cam_pytest_cam')
    except OSError:
        pass


def test_frames_stream_and_change(camera_proc):
    from visual_foresight_tpu.native.camera_client import ShmCameraClient
    client = ShmCameraClient('pytest_cam', wait_timeout=10.0)
    assert (client.height, client.width, client.channels) == (48, 64, 3)

    f1 = client.read_frame(timeout=2.0)
    assert f1 is not None and f1.shape == (48, 64, 3)
    f2 = client.read_frame(timeout=2.0)
    assert f2 is not None
    assert not np.array_equal(f1, f2), 'frames should advance'
    assert client.last_timestamp > 0


def test_frame_rate_throttled(camera_proc):
    from visual_foresight_tpu.native.camera_client import ShmCameraClient
    client = ShmCameraClient('pytest_cam', wait_timeout=10.0)
    client.read_frame(timeout=2.0)
    c0 = client._read_counter()
    time.sleep(1.0)
    c1 = client._read_counter()
    rate = c1 - c0
    assert 25 <= rate <= 90, 'publish rate {} should be near 60 fps'.format(rate)


def test_camera_recorder_integration(camera_proc):
    """CameraRecorder consumes the native stream when ROS is absent."""
    from visual_foresight_tpu.envs.robot_envs.util.camera_recorder import (
        CameraRecorder)
    from visual_foresight_tpu.envs.robot_envs.util.topic_utils import IMTopic
    topic = IMTopic('pytest_cam', height=24, width=32)
    rec = CameraRecorder(topic)
    stamp, img = rec.get_image()
    assert img.shape == (24, 32, 3)
    assert abs(stamp - time.time()) < 5.0


def test_log_cameras_snapshot(camera_proc, tmp_path):
    """log_cameras grabs one frame per channel from the native source and
    writes a timestamped view folder (reference log_cameras.py capability)."""
    from visual_foresight_tpu.envs.robot_envs.util import log_cameras
    out = log_cameras.main([str(tmp_path), '--topic_names', 'pytest_cam',
                            '--height', '48', '--width', '64'])
    import glob
    jpgs = glob.glob(os.path.join(out, '*.jpg'))
    assert len(jpgs) == 1 and jpgs[0].endswith('pytest_cam.jpg')
    import cv2
    img = cv2.imread(jpgs[0])
    assert img.shape == (48, 64, 3) and img.any()


def test_robot_glue_cli_surfaces():
    """get_points/launchers parse their CLIs and fail only at the
    robot-SDK boundary (no ROS on this box)."""
    import pytest as _pytest
    from visual_foresight_tpu.envs.robot_envs.util import get_points, launchers
    with _pytest.raises((ImportError, ModuleNotFoundError)):
        get_points.make_controller('sawyer', 'right')
    with _pytest.raises(NotImplementedError):
        get_points.make_controller('ur5', 'right')
    parser_probe = launchers.main.__module__  # importable
    assert parser_probe.endswith('launchers')
