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
