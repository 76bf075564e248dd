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


_FORCE_H = 130


def svg_force_strip(
    title: str,
    base_value: float,
    items: list[tuple[str, float, float]],
    fx: float,
    width: int = _W,
    standalone: bool = True,
) -> str:
    """Per-instance SHAP force strip (shap.plots.force's additive-force
    layout, xai_visualizations.py:175-210): one horizontal band on the
    model-output axis where positive contributions stack LEFT of f(x)
    pushing right (red chevrons, largest nearest the junction) and
    negative contributions stack RIGHT of f(x) pushing left (blue),
    with E[f(X)] marked on the same axis — the force reading is that the
    two stacks meet exactly at f(x), the additive identity
    base + sum(phi) = f(x) drawn as opposing arrows. ``items`` are
    (label, phi, feature_value); a NaN feature_value renders label-only.
    Deterministic string building like the sibling emitters;
    ``standalone=False`` omits the xmlns/size attrs wrapper position so
    strips can stack inside svg_force_all."""
    pos = sorted([it for it in items if it[1] > 0], key=lambda t: -abs(t[1]))
    neg = sorted([it for it in items if it[1] < 0], key=lambda t: -abs(t[1]))
    sum_pos = sum(p for _l, p, _v in pos)
    sum_neg = sum(-p for _l, p, _v in neg)
    x_lo = min(fx - sum_pos, base_value, fx)
    x_hi = max(fx + sum_neg, base_value, fx)
    span = (x_hi - x_lo) or 1.0
    inner_w = width - 2 * _MARGIN
    band_y, band_h = 56, 26

    def sx(v: float) -> float:
        return _MARGIN + inner_w * (v - x_lo) / span

    parts = []
    if standalone:
        parts.append(
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" '
            f'height="{_FORCE_H}" viewBox="0 0 {width} {_FORCE_H}" '
            f'font-family="sans-serif">'
        )
    parts.append(
        f'<text x="{width // 2}" y="18" text-anchor="middle" '
        f'font-size="13">{escape(title)}</text>'
    )
    # axis with base value and f(x) markers
    parts.append(
        f'<line x1="{_MARGIN}" y1="{band_y + band_h + 14}" '
        f'x2="{width - _MARGIN}" y2="{band_y + band_h + 14}" stroke="#bbb"/>'
    )
    parts.append(
        f'<line x1="{sx(base_value):.1f}" y1="{band_y - 16}" '
        f'x2="{sx(base_value):.1f}" y2="{band_y + band_h + 14}" '
        f'stroke="#999" stroke-dasharray="4,3"/>'
    )
    parts.append(
        f'<text x="{sx(base_value):.1f}" y="{band_y - 20}" '
        f'text-anchor="middle" font-size="10">base={_fmt(base_value)}</text>'
    )
    parts.append(
        f'<text x="{sx(fx):.1f}" y="{band_y - 6}" text-anchor="middle" '
        f'font-size="11" font-weight="bold">f(x)={_fmt(fx)}</text>'
    )

    def chevron(x0: float, x1: float, color: str, rightward: bool) -> str:
        """Arrow block from x0..x1 pointing toward the junction."""
        tip = min(6.0, abs(x1 - x0))
        y0, y1 = band_y, band_y + band_h
        ym = (y0 + y1) / 2
        if rightward:
            pts = f"{x0:.1f},{y0} {x1 - tip:.1f},{y0} {x1:.1f},{ym:.1f} {x1 - tip:.1f},{y1} {x0:.1f},{y1}"
        else:
            pts = f"{x1:.1f},{y0} {x0 + tip:.1f},{y0} {x0:.1f},{ym:.1f} {x0 + tip:.1f},{y1} {x1:.1f},{y1}"
        return f'<polygon points="{pts}" fill="{color}" stroke="#fff" stroke-width="0.5"/>'

    # positive stack: walk LEFT from the junction, largest first
    cum = 0.0
    for i, (lab, phi, val) in enumerate(pos):
        x1 = sx(fx - cum)
        cum += phi
        x0 = sx(fx - cum)
        parts.append(chevron(x0, x1, "#c0392b", rightward=True))
        label = str(lab) if val != val else f"{lab}={_fmt(val)}"
        ly = band_y + band_h + (26 if i % 2 else 38)
        parts.append(
            f'<text x="{(x0 + x1) / 2:.1f}" y="{ly}" text-anchor="middle" '
            f'font-size="9" fill="#c0392b">{escape(label)}</text>'
        )
    # negative stack: walk RIGHT from the junction, largest first
    cum = 0.0
    for i, (lab, phi, val) in enumerate(neg):
        x0 = sx(fx + cum)
        cum += -phi
        x1 = sx(fx + cum)
        parts.append(chevron(x0, x1, "#4878a8", rightward=False))
        label = str(lab) if val != val else f"{lab}={_fmt(val)}"
        ly = band_y + band_h + (26 if i % 2 else 38)
        parts.append(
            f'<text x="{(x0 + x1) / 2:.1f}" y="{ly}" text-anchor="middle" '
            f'font-size="9" fill="#4878a8">{escape(label)}</text>'
        )
    if standalone:
        parts.append("</svg>")
    return "\n".join(parts)


def html_force_page(title: str, strips: list[str]) -> str:
    """The shap.save_html analog: a self-contained HTML page stacking one
    or many force strips (the reference emits a per-instance force HTML
    and an all-instances summary, xai_visualizations.py:175-210). Pure
    deterministic string building — byte-identical for identical inputs."""
    body = []
    y = 0
    for s in strips:
        body.append(
            f'<g transform="translate(0,{y})">{s}</g>'
        )
        y += _FORCE_H
    svg = (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{y}" '
        f'viewBox="0 0 {_W} {y}" font-family="sans-serif">'
        + "\n".join(body)
        + "</svg>"
    )
    return (
        "<!DOCTYPE html>\n<html><head><meta charset=\"utf-8\"/>"
        f"<title>{escape(title)}</title></head>\n<body>\n{svg}\n</body></html>\n"
    )
