"""Headless visualization.

Replaces the reference's Qt painting layer (urh/ui/painting, 82k LoC of
generated Qt code) with renderer-agnostic outputs: min/max-decimated
plot paths (urh_tpu.dsp.decimation), BGRA spectrogram images
(urh_tpu.dsp.spectrogram) and optional matplotlib PNG export for
signals, demodulated views and spectrograms.
"""

from __future__ import annotations

import numpy as np

from urh_tpu.dsp.decimation import create_path
from urh_tpu.dsp.spectrogram import Spectrogram


def _get_pyplot():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_signal(signal, filename: str, show_qad=False):
    """Render a signal's real part (and optionally the demodulated view)
    to an image file, min/max decimated like the GUI's signal frame."""
    plt = _get_pyplot()
    nrows = 2 if show_qad else 1
    fig, axes = plt.subplots(nrows, 1, figsize=(12, 3 * nrows), squeeze=False)

    (x, y), = create_path(signal.real_plot_data, 0, signal.num_samples)
    axes[0][0].plot(x, y, linewidth=0.5)
    axes[0][0].set_title(signal.name)
    axes[0][0].set_xlabel("sample")

    if show_qad:
        qad = signal.qad
        (x, y), = create_path(qad, 0, len(qad))
        axes[1][0].plot(x, y, linewidth=0.5, color="tab:orange")
        axes[1][0].set_title("demodulated")
        axes[1][0].set_xlabel("sample")

    fig.tight_layout()
    fig.savefig(filename, dpi=120)
    plt.close(fig)
    return filename


def plot_spectrogram(samples, filename: str, sample_rate=1e6,
                     window_size=Spectrogram.DEFAULT_FFT_WINDOW_SIZE,
                     colormap="magma"):
    """Render an STFT spectrogram (computed on device) to an image file."""
    plt = _get_pyplot()
    from urh_tpu.util import colormaps

    colormaps.choose_colormap(colormap)
    spec = Spectrogram(samples, window_size=window_size)
    image = spec.create_spectrogram_image()

    # BGRA -> RGB for matplotlib
    rgb = image[:, :, [2, 1, 0]]
    fig, ax = plt.subplots(figsize=(12, 6))
    duration = len(spec.samples) / sample_rate
    ax.imshow(np.rot90(rgb, k=-1), aspect="auto",
              extent=[0, duration, -sample_rate / 2, sample_rate / 2])
    ax.set_xlabel("time [s]")
    ax.set_ylabel("frequency [Hz]")
    fig.tight_layout()
    fig.savefig(filename, dpi=120)
    plt.close(fig)
    return filename


def plot_messages(messages, filename: str, view=0):
    """Render a protocol table (bit/hex view with label coloring) to an
    image file — the headless analysis-tab equivalent."""
    plt = _get_pyplot()
    rows = []
    for msg in messages:
        rows.append(msg.view_to_string(view, decoded=True, show_pauses=False))

    fig, ax = plt.subplots(figsize=(12, 0.4 * max(1, len(rows)) + 1))
    ax.axis("off")
    for i, row in enumerate(rows):
        ax.text(0, 1 - (i + 1) / (len(rows) + 1), f"{i}: {row}",
                family="monospace", fontsize=8, transform=ax.transAxes)
    fig.tight_layout()
    fig.savefig(filename, dpi=120)
    plt.close(fig)
    return filename
