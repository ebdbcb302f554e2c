"""Matplotlib helpers (`utils.py:10-19` parity)."""
from __future__ import annotations

import matplotlib

matplotlib.use("Agg")
import matplotlib.pylab as plt  # noqa: E402


def plot_spectrogram(spectrogram):
    """Figure with an auto-aspect spectrogram image (for TensorBoard panels)."""
    fig, ax = plt.subplots(figsize=(10, 2))
    im = ax.imshow(spectrogram, aspect="auto", origin="lower", interpolation="none")
    plt.colorbar(im, ax=ax)
    fig.canvas.draw()
    plt.close()
    return fig
