"""Score histogram plotting (reference ``visualizer/plot_helper.py``)."""

import matplotlib

matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402


def plot_score_hist(scores, tick_value=None, tick_label='expert'):
    """Histogram of CEM sample scores, optional expert comparison tick;
    returns the figure image as a uint8 array."""
    fig = plt.figure()
    plt.hist(np.asarray(scores).ravel(), bins=30)
    if tick_value is not None:
        plt.axvline(tick_value, color='r', linestyle='--', label=tick_label)
        plt.legend()
    plt.xlabel('score')
    plt.ylabel('count')
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
    plt.close(fig)
    return buf
