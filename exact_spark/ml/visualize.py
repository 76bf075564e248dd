"""X7 visual artifacts — native SVG emitters (no plotting library).

The reference writes PNG/HTML plots through matplotlib/plotly
(Backend/XAI_methods/xai_visualizations.py:12-397); neither library exists
in this environment, but SVG is plain XML a browser renders directly, so
the artifact CONTRACT — per-method feature-importance charts and the
detection timeline the frontend shows — is delivered with zero plotting
dependencies:

- :func:`svg_bar_chart` — horizontal feature-importance bars (the
  aggregated_feature_importances companion plot, xai_visualizations'
  summary-bar shape).
- :func:`svg_timeseries` — the job page's value-over-time line with
  anomaly markers (job_page_callbacks.py:1000's Scattergl plot); callers
  feed it through ``ts_downsample_m4`` so the polyline respects the
  frontend's 1000-point budget at ANY table size — the engine-side
  downsampling and the plot emitter compose.

Everything is deterministic string building: same inputs -> byte-identical
SVG, so artifacts are diffable and cacheable.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

_W, _H = 640, 360
_MARGIN = 60


def _fmt(v: float) -> str:
    return f"{v:.2f}".rstrip("0").rstrip(".")


def svg_bar_chart(title: str, labels: list[str], values: list[float]) -> str:
    """Horizontal bar chart, bars sorted as given (callers pre-sort by
    importance). Scales to the max value; zero-max renders empty bars."""
    n = len(labels)
    bar_h = max(12, min(28, (_H - 2 * _MARGIN) // max(n, 1)))
    vmax = max(values) if values and max(values) > 0 else 1.0
    inner_w = _W - 2 * _MARGIN - 80
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<text x="{_W // 2}" y="24" text-anchor="middle" font-size="16">'
        f"{escape(title)}</text>",
    ]
    for i, (lab, v) in enumerate(zip(labels, values)):
        y = _MARGIN + i * (bar_h + 6)
        w = inner_w * (v / vmax)
        parts.append(
            f'<text x="{_MARGIN - 6}" y="{y + bar_h * 0.75:.0f}" '
            f'text-anchor="end" font-size="11">{escape(str(lab))}</text>'
        )
        parts.append(
            f'<rect x="{_MARGIN}" y="{y}" width="{w:.1f}" height="{bar_h}" '
            f'fill="#4878a8"/>'
        )
        parts.append(
            f'<text x="{_MARGIN + w + 4:.1f}" y="{y + bar_h * 0.75:.0f}" '
            f'font-size="11">{_fmt(v)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)


def svg_timeseries(
    title: str,
    points: list[tuple[float, float]],
    anomalies: list[tuple[float, float]] | None = None,
) -> str:
    """Value-over-time polyline + anomaly markers. ``points`` are
    (epoch_seconds, value) pairs IN TIME ORDER — feed the M4-downsampled
    envelope so the polyline stays within the frontend point budget;
    ``anomalies`` are (epoch_seconds, value) marker positions (the
    reference caps markers at 500, job_page_callbacks.py:1038 — callers
    enforce the cap)."""
    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<text x="{_W // 2}" y="24" text-anchor="middle" font-size="16">'
        f"{escape(title)}</text>",
    ]
    if points:
        ts = [p[0] for p in points]
        vs = [p[1] for p in points]
        t0, t1 = min(ts), max(ts)
        v0, v1 = min(vs), max(vs)
        tspan = (t1 - t0) or 1.0
        vspan = (v1 - v0) or 1.0
        inner_w, inner_h = _W - 2 * _MARGIN, _H - 2 * _MARGIN

        def sx(t: float) -> float:
            return _MARGIN + inner_w * (t - t0) / tspan

        def sy(v: float) -> float:
            return _H - _MARGIN - inner_h * (v - v0) / vspan

        path = " ".join(f"{sx(t):.1f},{sy(v):.1f}" for t, v in points)
        parts.append(
            f'<polyline points="{path}" fill="none" stroke="#4878a8" '
            f'stroke-width="1.5"/>'
        )
        for t, v in anomalies or []:
            parts.append(
                f'<circle cx="{sx(t):.1f}" cy="{sy(v):.1f}" r="3" '
                f'fill="#c0392b"/>'
            )
        # axis frame + min/max ticks
        parts.append(
            f'<rect x="{_MARGIN}" y="{_MARGIN}" width="{inner_w}" '
            f'height="{inner_h}" fill="none" stroke="#999"/>'
        )
        parts.append(
            f'<text x="{_MARGIN}" y="{_H - _MARGIN + 16}" font-size="10">'
            f"{_fmt(t0)}</text>"
        )
        parts.append(
            f'<text x="{_W - _MARGIN}" y="{_H - _MARGIN + 16}" '
            f'text-anchor="end" font-size="10">{_fmt(t1)}</text>'
        )
        parts.append(
            f'<text x="{_MARGIN - 6}" y="{_H - _MARGIN}" text-anchor="end" '
            f'font-size="10">{_fmt(v0)}</text>'
        )
        parts.append(
            f'<text x="{_MARGIN - 6}" y="{_MARGIN + 10}" text-anchor="end" '
            f'font-size="10">{_fmt(v1)}</text>'
        )
    parts.append("</svg>")
    return "\n".join(parts)
