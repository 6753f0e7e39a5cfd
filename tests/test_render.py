"""K7 rendering sink: import-gated matplotlib helpers (plans/render.py).
This container ships no matplotlib, so the contract under test is the
honest gate — a NotImplementedError naming the dependency, not an
ImportError crash — plus the prep→render data handoff shape."""

from __future__ import annotations

import pandas as pd
import pytest

from gisaid_pipeline_functions_spark.plans.render import (
    render_heatmap,
    render_line_plot,
)

HAVE_MPL = True
try:  # pragma: no cover - env probe
    import matplotlib  # noqa: F401
except ImportError:
    HAVE_MPL = False


@pytest.mark.skipif(HAVE_MPL, reason="container unexpectedly has matplotlib")
def test_render_is_cleanly_gated(tmp_path):
    pdf = pd.DataFrame({"week_start": ["2024-01-07"], "pct": [0.5], "key": ["A"]})
    with pytest.raises(NotImplementedError, match="matplotlib"):
        render_line_plot(pdf, "week_start", "pct", "key", str(tmp_path / "x.png"))
    with pytest.raises(NotImplementedError, match="matplotlib"):
        render_heatmap(pdf[["key"]], "key", str(tmp_path / "y.png"))


@pytest.mark.skipif(not HAVE_MPL, reason="no matplotlib in container")
def test_render_writes_files(tmp_path):  # pragma: no cover - env-dependent
    pdf = pd.DataFrame(
        {
            "week_start": ["2024-01-07", "2024-01-14"] * 2,
            "pct": [0.1, 0.2, 0.3, 0.4],
            "key": ["A", "A", "B", "B"],
        }
    )
    out = render_line_plot(pdf, "week_start", "pct", "key", str(tmp_path / "x.png"))
    assert (tmp_path / "x.png").exists() and out.endswith("x.png")
