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
