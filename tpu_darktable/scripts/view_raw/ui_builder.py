"""Widget-layout toolkit: measured-text placement for matplotlib UIs.

Counterpart of the reference's view_raw/ui_builder.py (344 LoC layout
manager): widget axes are sized from rendered text measurements so radio
rows and checkbox panels fit their labels at any figure size.  The API here
is a small vertical-stack builder plus clean-axes/widget helpers rather
than the reference's free functions.
"""

from __future__ import annotations


def create_clean_axes(fig, rect, *, zorder: int = 10, navigate: bool = False,
                      frame: bool = True):
    """Axes with no ticks, high z-order, optional frame — a widget canvas."""
    ax = fig.add_axes(rect)
    ax.set_xticks([])
    ax.set_yticks([])
    ax.set_zorder(zorder)
    ax.set_navigate(navigate)
    if not frame:
        ax.axis('off')
    return ax


def measure_text_fractions(fig, labels, fontsize: float = 8.0):
    """Width of each label as a fraction of figure width (rendered metrics,
    with a 15% safety margin; falls back to a char-count estimate when the
    canvas has no renderer, e.g. before the first draw on some backends)."""
    try:
        fig.canvas.draw()
        renderer = fig.canvas.get_renderer()
        fig_w = fig.get_window_extent(renderer=renderer).width
        probe = fig.text(0, 0, '', fontsize=fontsize)
        widths = []
        for label in labels:
            probe.set_text(label)
            widths.append(probe.get_window_extent(renderer=renderer).width / fig_w)
        probe.remove()
        return [w * 1.15 for w in widths]
    except Exception:
        return [len(label) * 0.011 * (fontsize / 8.0) for label in labels]


def fit_fontsize(fig, labels, avail_fraction: float, base: float = 8.0,
                 floor: float = 5.0) -> float:
    """Largest font size (<= base) at which the widest label fits the
    available figure-width fraction."""
    widest = max(measure_text_fractions(fig, labels, base), default=0.0)
    if widest <= 0 or widest <= avail_fraction:
        return base
    return max(floor, base * avail_fraction / widest)


def create_radio_buttons(ax, labels, active_label=None, fontsize: float | None = None):
    """RadioButtons sized to their labels; returns the widget."""
    from matplotlib.widgets import RadioButtons

    if fontsize is None:
        fig = ax.get_figure()
        avail = ax.get_position().width * 0.8
        fontsize = fit_fontsize(fig, labels, avail)
    active = labels.index(active_label) if active_label in labels else 0
    rb = RadioButtons(ax, labels, active=active)
    for text in rb.labels:
        text.set_fontsize(fontsize)
    return rb


def create_checkboxes(ax, labels, actives, fontsize: float | None = None):
    """CheckButtons sized to their labels; returns the widget."""
    from matplotlib.widgets import CheckButtons

    if fontsize is None:
        fig = ax.get_figure()
        avail = ax.get_position().width * 0.8
        fontsize = fit_fontsize(fig, labels, avail)
    cb = CheckButtons(ax, labels, actives)
    for text in cb.labels:
        text.set_fontsize(fontsize)
    return cb


class VStack:
    """Top-down widget column in figure coordinates.

    Each `take(height)` returns the next rect and advances the cursor;
    row heights for label stacks come from `rows(n)` so panels grow with
    their option count instead of being hand-positioned.
    """

    ROW = 0.03  # nominal single-row height (figure fraction)
    GAP = 0.012

    def __init__(self, fig, x: float, top: float, width: float):
        self.fig = fig
        self.x = x
        self.y = top
        self.width = width
        self._left_height = 0.0  # pending half=1 panel height

    def take(self, height: float, *, indent: float = 0.0, width: float | None = None):
        w = self.width - indent if width is None else width
        self.y -= height
        rect = (self.x + indent, self.y, w, height)
        self.y -= self.GAP
        return rect

    def rows(self, n: int) -> float:
        """Height for an n-label widget panel."""
        return max(1, n) * self.ROW

    def slider_ax(self, label_indent: float = 0.05):
        """Axes for one labelled slider row."""
        return self.fig.add_axes(self.take(self.ROW * 0.8, indent=label_indent))

    def panel_ax(self, n_labels: int, *, half: int = 0):
        """Axes for an n-label radio/checkbox panel.  `half`: 0 = full
        width, 1 = left half (does not advance), 2 = right half (advances
        by the taller of the pair)."""
        height = self.rows(n_labels)
        if half == 0:
            return create_clean_axes(self.fig, self.take(height))
        w = self.width / 2
        if half == 1:
            self._left_height = height
            return create_clean_axes(self.fig, (self.x, self.y - height, w, height))
        rect = (self.x + w, self.y - height, w, height)
        self.y -= max(height, self._left_height) + self.GAP
        self._left_height = 0.0
        return create_clean_axes(self.fig, rect)

    def button_row(self, n: int):
        """n equal-width button axes on one row."""
        height = self.ROW
        self.y -= height
        w = self.width / n
        axes = [
            self.fig.add_axes((self.x + i * w, self.y, w, height)) for i in range(n)
        ]
        self.y -= self.GAP
        return axes


__all__ = [
    'VStack',
    'create_checkboxes',
    'create_clean_axes',
    'create_radio_buttons',
    'fit_fontsize',
    'measure_text_fractions',
]
