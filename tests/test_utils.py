import numpy as np

from ttsx.utils import (
    check_file_sizes, trend_figure, segment_figure, drift_figure, save_html)
from ttsx.eval.acoustic_eval import MOS_PLACEHOLDER


def test_check_file_sizes_clean_repo():
    from pathlib import Path
    root = Path(__file__).resolve().parents[1]
    violations = check_file_sizes(root)
    assert violations == [], f"LoC limits exceeded: {violations}"


def test_check_file_sizes_detects(tmp_path):
    d = tmp_path / "ttsx" / "utils"
    d.mkdir(parents=True)
    (d / "big.py").write_text("\n".join(f"x{i} = {i}" for i in range(300)))
    v = check_file_sizes(tmp_path, {"ttsx/utils": 200})
    assert len(v) == 1 and v[0][1] == 300


def test_figures(tmp_path):
    svg = trend_figure({"f0": [1, 2, 3, 2, 1], "energy": [0, 1, 0, 1, 0]})
    assert svg.startswith("<svg") and "polyline" in svg
    seg = segment_figure([{"start": 0, "end": 1, "label": "joy"},
                          {"start": 1, "end": 2, "label": "anger"}], 2.0)
    assert seg.count("<rect") == 2
    dr = drift_figure([0, 0, 3, 3, 0], [{"start": 2, "end": 3,
                                         "polarity": 1}])
    assert "opacity" in dr
    save_html([svg, seg, dr], tmp_path / "figs.html")
    assert (tmp_path / "figs.html").read_text().count("<svg") == 3


def test_mos_placeholder():
    assert MOS_PLACEHOLDER == 4.0
