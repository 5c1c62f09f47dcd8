"""Day-wise trend chart sink — twin of ``create_average_time_graph``
(tabjolt_email.py:81-122): markers, per-point annotations, 45° date
ticks, 1000 ms y-tick grid.

matplotlib is not installed in this container, so the renderer is
import-gated: :func:`render_trend_chart` returns ``None`` when the
library is unavailable (callers treat the chart as optional), and the
pure data-preparation step is exposed separately so it stays tested.
"""

from __future__ import annotations

try:  # pragma: no cover - environment-dependent
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    HAVE_MATPLOTLIB = True
except ImportError:  # pragma: no cover
    plt = None
    HAVE_MATPLOTLIB = False


def trend_points(rows) -> tuple[list, list]:
    """(dates, values) sorted by date — the reference re-sorts
    client-side (tabjolt_email.py:94); sorting here keeps the chart
    correct regardless of upstream ordering."""
    pairs = sorted((r[0], int(r[1])) for r in rows)
    if not pairs:
        return [], []
    dates, values = zip(*pairs)
    return list(dates), list(values)


def ytick_ceiling(max_value: int) -> int:
    """Y-axis upper bound: ceil to the next 1000 plus one grid step
    (tabjolt_email.py:103)."""
    return (int(max_value / 1000) + 1) * 1000 + 1000


def render_trend_chart(rows, out_path: str) -> str | None:
    """Render the day-wise average chart; None if matplotlib absent."""
    if not HAVE_MATPLOTLIB:
        return None
    dates, values = trend_points(rows)
    if not values:
        return None
    plt.figure(figsize=(10, 6))
    plt.plot(dates, values, marker="o", linestyle="-")
    plt.xlabel("Date")
    plt.ylabel("Average Time (ms)")
    plt.title("Average Time Taken (Day Wise)")
    plt.xticks(rotation=45)
    plt.yticks(range(1000, ytick_ceiling(max(values)), 1000))
    for date, value in zip(dates, values):
        plt.annotate(
            f"{value}", (date, value), textcoords="offset points",
            xytext=(0, 10), ha="center",
        )
    plt.tight_layout()
    plt.savefig(out_path)
    plt.close()
    return out_path
