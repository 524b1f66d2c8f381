"""Before/after image preview (parity with the reference's pyvimz plotting,
reference: pyvimz/pyvimz/img/plotting.py:4-49).

Redesigned for headless use: `preview_pair` returns the matplotlib Figure
(callers decide whether to `show()` or save), sizes panels from the pixel
dimensions, and accepts grayscale or RGB arrays interchangeably.
"""

from __future__ import annotations

import numpy as np

_DPI = 80


def preview_pair(
    original: np.ndarray,
    transformed: np.ndarray,
    titles: tuple[str, str] = ("Original", "Transformed"),
    max_width: int = 1000,
    save_to: str | None = None,
    show: bool = False,
):
    """Render two images side by side; returns the matplotlib Figure.

    If `save_to` is given the figure is written there (PNG); with
    `show=True` it is also displayed interactively.
    """
    import matplotlib

    if not show:
        matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    panels = [np.asarray(original), np.asarray(transformed)]
    widths = [p.shape[1] for p in panels]
    heights = [p.shape[0] for p in panels]
    scale = max_width / sum(widths)
    fig, axes = plt.subplots(
        1,
        2,
        figsize=(max_width / _DPI, max(heights) * scale / _DPI),
        dpi=_DPI,
    )
    for ax, img, title in zip(axes, panels, titles):
        ax.imshow(img, cmap="gray" if img.ndim == 2 else None)
        ax.set_title(title)
        ax.set_axis_off()
    fig.tight_layout()
    if save_to:
        fig.savefig(save_to, bbox_inches="tight")
    if show:
        plt.show()
    return fig
