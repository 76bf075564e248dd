"""X7 SVG artifact emitters: structural assertions via XML parsing (no
rendering library needed to verify)."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from exact_spark.ml.visualize import svg_bar_chart, svg_timeseries

_NS = "{http://www.w3.org/2000/svg}"


def test_bar_chart_structure():
    svg = svg_bar_chart("imp", ["f1", "f2", "f3"], [3.0, 1.5, 0.0])
    root = ET.fromstring(svg)
    bars = root.findall(f"{_NS}rect")
    assert len(bars) == 3
    widths = [float(b.get("width")) for b in bars]
    assert widths[0] > widths[1] > widths[2] == 0.0
    labels = [t.text for t in root.findall(f"{_NS}text")]
    assert "imp" in labels and "f1" in labels and "f2" in labels


def test_bar_chart_deterministic_and_escaped():
    a = svg_bar_chart("t", ["a<b&c"], [1.0])
    assert a == svg_bar_chart("t", ["a<b&c"], [1.0])
    ET.fromstring(a)  # escaped label still parses as XML


def test_timeseries_structure():
    pts = [(float(t), float((t * 7) % 5)) for t in range(100)]
    marks = [(10.0, float((10 * 7) % 5)), (50.0, float((50 * 7) % 5))]
    svg = svg_timeseries("series", pts, marks)
    root = ET.fromstring(svg)
    poly = root.findall(f"{_NS}polyline")
    assert len(poly) == 1
    coords = poly[0].get("points").split()
    assert len(coords) == 100
    xs = [float(c.split(",")[0]) for c in coords]
    assert xs == sorted(xs)  # time order preserved left-to-right
    assert len(root.findall(f"{_NS}circle")) == 2


def test_empty_series_renders():
    root = ET.fromstring(svg_timeseries("empty", []))
    assert root.findall(f"{_NS}polyline") == []


def test_waterfall_structure_and_additivity():
    from exact_spark.ml.visualize import svg_waterfall

    items = [("v1", 2.0, 9.5), ("v2", -0.5, 1.0), ("v3", 0.25, 0.0)]
    base, fx = 1.0, 1.0 + 2.0 - 0.5 + 0.25
    svg = svg_waterfall("SHAP waterfall — instance 7", base, items, fx)
    root = ET.fromstring(svg)
    bars = root.findall(f"{_NS}rect")
    assert len(bars) == 3
    # positive phi renders red, negative blue (the shap color contract)
    fills = [b.get("fill") for b in bars]
    assert fills[0] == "#c0392b" and fills[1] == "#4878a8" and fills[2] == "#c0392b"
    # the cumulative walk: each bar's span is |phi| on the shared x-scale,
    # so bar widths are proportional to |phi|
    widths = [float(b.get("width")) for b in bars]
    assert abs(widths[0] / widths[1] - 2.0 / 0.5) < 0.05
    assert abs(widths[0] / widths[2] - 2.0 / 0.25) < 0.05
    # base and f(x) reference verticals present
    lines = root.findall(f"{_NS}line")
    assert len(lines) == 2
    texts = [t.text for t in root.findall(f"{_NS}text")]
    assert any("E[f(X)]" in (t or "") for t in texts)
    assert any("f(x)" in (t or "") for t in texts)
    # deterministic
    assert svg == svg_waterfall("SHAP waterfall — instance 7", base, items, fx)


def test_waterfall_bar_positions_follow_cumulative_walk():
    from exact_spark.ml.visualize import svg_waterfall

    items = [("a", 1.0, 0.0), ("b", 1.0, 0.0), ("c", -2.0, 0.0)]
    svg = svg_waterfall("t", 0.0, items, 0.0)
    root = ET.fromstring(svg)
    bars = root.findall(f"{_NS}rect")
    x = [float(b.get("x")) for b in bars]
    w = [float(b.get("width")) for b in bars]
    # bar 2 starts where bar 1 ended; bar 3 (negative) walks back to start
    assert abs((x[0] + w[0]) - x[1]) < 0.2
    assert abs(x[2] - x[0]) < 0.2 and abs(w[2] - (w[0] + w[1])) < 0.2


def test_waterfall_remainder_row_shows_no_nan_value():
    from exact_spark.ml.visualize import svg_waterfall

    items = [("v1", 2.0, 9.5), ("4 other features", -0.5, float("nan"))]
    svg = svg_waterfall("t", 0.0, items, 1.5)
    assert "nan" not in svg
    assert "4 other features" in svg
    ET.fromstring(svg)


def test_force_strip_stacks_meet_at_fx():
    """The additive-force contract: positive chevrons stack LEFT of f(x),
    negative chevrons stack RIGHT, and the two stacks meet exactly at the
    f(x) axis position."""
    from exact_spark.ml.visualize import svg_force_strip

    items = [("a", 0.6, 1.0), ("b", -0.3, 2.0), ("c", 0.2, 0.5), ("d", -0.1, 3.0)]
    base, fx = 1.0, 1.0 + 0.6 - 0.3 + 0.2 - 0.1
    svg = svg_force_strip("force", base, items, fx)
    root = ET.fromstring(svg)
    polys = root.findall(f"{_NS}polygon")
    assert len(polys) == 4  # one chevron per feature
    reds = [p for p in polys if p.get("fill") == "#c0392b"]
    blues = [p for p in polys if p.get("fill") == "#4878a8"]
    assert len(reds) == 2 and len(blues) == 2

    def xs(poly):
        return [float(pt.split(",")[0]) for pt in poly.get("points").split()]

    junction_from_pos = max(max(xs(p)) for p in reds)
    junction_from_neg = min(min(xs(p)) for p in blues)
    assert abs(junction_from_pos - junction_from_neg) < 0.2
    # every positive chevron sits left of the junction, negatives right
    assert all(min(xs(p)) <= junction_from_pos + 0.2 for p in reds)
    assert all(max(xs(p)) >= junction_from_neg - 0.2 for p in blues)


def test_force_strip_deterministic():
    from exact_spark.ml.visualize import svg_force_strip

    items = [("x<y", 0.5, float("nan"))]
    a = svg_force_strip("t&", 0.0, items, 0.5)
    assert a == svg_force_strip("t&", 0.0, items, 0.5)
    ET.fromstring(a)  # escaped labels still parse


def test_html_force_page_stacks_strips():
    from exact_spark.ml.visualize import html_force_page, svg_force_strip

    strips = [
        svg_force_strip(f"i{k}", 0.0, [("f", 0.4, 1.0)], 0.4, standalone=False)
        for k in range(3)
    ]
    page = html_force_page("all", strips)
    assert page.startswith("<!DOCTYPE html>")
    svg_start = page.index("<svg")
    svg_end = page.index("</svg>", page.rindex("</g>")) + len("</svg>")
    root = ET.fromstring(page[svg_start:svg_end])
    gs = root.findall(f"{_NS}g")
    assert len(gs) == 3
    offsets = [g.get("transform") for g in gs]
    assert offsets == ["translate(0,0)", "translate(0,130)", "translate(0,260)"]


def test_render_force_plots_from_signed_phis(tmp_path):
    import pandas as pd

    from exact_spark.ml.explain import render_force_plots

    pdf = pd.DataFrame(
        {
            "id": [7, 7, 9, 9],
            "feature": ["v1", "v2", "v1", "v2"],
            "phi": [0.5, -0.2, -0.4, 0.1],
            "value": [1.0, 2.0, 3.0, 4.0],
            "base_value": [0.3, 0.3, 0.3, 0.3],
            "fx": [0.6, 0.6, 0.0, 0.0],
        }
    )
    paths = render_force_plots(pdf, tmp_path)
    names = [p.split("/")[-1] for p in paths]
    assert names == [
        "force_instance_7.html",
        "force_instance_9.html",
        "force_all_instances.html",
    ]
    for p in paths:
        text = open(p).read()
        assert text.startswith("<!DOCTYPE html>")
        svg = text[text.index("<svg"): text.rindex("</svg>") + 6]
        ET.fromstring(svg)  # every page's SVG is well-formed XML


def test_render_force_plots_bounds_instance_pages(tmp_path):
    """Per-instance force pages stop at max_instance_pages (ADVICE r07:
    the reference emits instance 1 + the all-instances page, so the
    per-instance set must not scale with the explain batch) — but every
    instance still contributes a strip to the all-instances page."""
    import pandas as pd

    from exact_spark.ml.explain import render_force_plots

    n = 5
    pdf = pd.DataFrame(
        {
            "id": [i for i in range(n) for _ in (0, 1)],
            "feature": ["v1", "v2"] * n,
            "phi": [0.5, -0.2] * n,
            "value": [1.0, 2.0] * n,
            "base_value": [0.3] * (2 * n),
            "fx": [0.6] * (2 * n),
        }
    )
    paths = render_force_plots(pdf, tmp_path, max_instance_pages=2)
    names = [p.split("/")[-1] for p in paths]
    assert names == [
        "force_instance_0.html",
        "force_instance_1.html",
        "force_all_instances.html",
    ]
    all_page = open(paths[-1]).read()
    # one <g transform=...> strip per instance on the summary page
    assert all_page.count("<g transform=") == n
