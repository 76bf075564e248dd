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


def svg_waterfall(
    title: str,
    base_value: float,
    items: list[tuple[str, float, float]],
    fx: float,
) -> str:
    """Per-instance SHAP waterfall (shap.plots.waterfall's shape,
    xai_visualizations.py:147-175): starting at E[f(X)] = ``base_value``,
    one signed bar per feature walks the cumulative sum to f(x) = ``fx``.
    ``items`` are (label, phi, feature_value) IN DISPLAY ORDER (callers
    sort by |phi| descending and cap at max_display; a trailing remainder
    row is just another item). Positive contributions render red and push
    right, negative render blue and push left — the shap color contract.
    Deterministic string building like the sibling emitters."""
    n = len(items)
    row_h = max(18, min(32, (_H - 2 * _MARGIN) // max(n + 1, 1)))
    # x-scale over the full excursion of the cumulative walk
    cums = [base_value]
    for _lab, phi, _v in items:
        cums.append(cums[-1] + phi)
    x_lo = min(cums + [fx])
    x_hi = max(cums + [fx])
    span = (x_hi - x_lo) or 1.0
    inner_w = _W - 2 * _MARGIN - 110

    def sx(v: float) -> float:
        return _MARGIN + 100 + inner_w * (v - x_lo) / span

    parts = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'viewBox="0 0 {_W} {_H}" font-family="sans-serif">',
        f'<text x="{_W // 2}" y="24" text-anchor="middle" font-size="16">'
        f"{escape(title)}</text>",
        # base and f(x) reference verticals
        f'<line x1="{sx(base_value):.1f}" y1="{_MARGIN - 10}" '
        f'x2="{sx(base_value):.1f}" y2="{_H - _MARGIN}" stroke="#999" '
        f'stroke-dasharray="4,3"/>',
        f'<text x="{sx(base_value):.1f}" y="{_MARGIN - 14}" '
        f'text-anchor="middle" font-size="10">E[f(X)]={_fmt(base_value)}</text>',
        f'<line x1="{sx(fx):.1f}" y1="{_MARGIN - 10}" x2="{sx(fx):.1f}" '
        f'y2="{_H - _MARGIN}" stroke="#333" stroke-dasharray="2,2"/>',
        f'<text x="{sx(fx):.1f}" y="{_MARGIN - 2}" text-anchor="middle" '
        f'font-size="10">f(x)={_fmt(fx)}</text>',
    ]
    for i, (lab, phi, val) in enumerate(items):
        y = _MARGIN + i * row_h
        x0, x1 = sx(cums[i]), sx(cums[i + 1])
        color = "#c0392b" if phi >= 0 else "#4878a8"
        left, width = min(x0, x1), max(abs(x1 - x0), 0.5)
        # a NaN value marks a valueless row (the collapsed 'other
        # features' remainder): label only, no "= nan"
        label = str(lab) if val != val else f"{lab} = {_fmt(val)}"
        parts.append(
            f'<text x="{_MARGIN + 94}" y="{y + row_h * 0.7:.0f}" '
            f'text-anchor="end" font-size="11">{escape(label)}</text>'
        )
        parts.append(
            f'<rect x="{left:.1f}" y="{y + 2}" width="{width:.1f}" '
            f'height="{row_h - 6}" fill="{color}"/>'
        )
        sign = "+" if phi >= 0 else "−"
        parts.append(
            f'<text x="{max(x0, x1) + 4:.1f}" y="{y + row_h * 0.7:.0f}" '
            f'font-size="11" fill="{color}">{sign}{_fmt(abs(phi))}</text>'
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
