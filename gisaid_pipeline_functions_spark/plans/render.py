"""Driver-side plot rendering (SURVEY K7 completion).

The engine's contract for plots is DATA PREP (plans/plotting_prep.py):
the wide matrices the reference's matplotlib code consumes
(Plotting_Functions.py:818–1024 line_plot/TS_Heatmap,
Multi_Panel_Plot.py:1–284). Rendering itself is inherently driver-side —
a collected, sink-sized table through matplotlib — so it lives here as a
thin, import-gated helper: the engine never depends on a plotting
library, and containers without matplotlib get a clear
NotImplementedError instead of an import crash.

Usage shape (mirrors the reference's call sites):

    top = prepare_top_n(ts_percent, n=8)
    pdf = subset_to_top_n(ts_percent, top).toPandas()   # sink-sized
    render_line_plot(pdf, x="week_start", y="pct", series="key",
                     out_path="prevalence.png")
"""

from __future__ import annotations


def _matplotlib():
    try:
        import matplotlib

        matplotlib.use("Agg")  # headless
        import matplotlib.pyplot as plt

        return plt
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "plot rendering requires matplotlib, which this container does "
            "not ship — install it on the driver, or consume the prepared "
            "tables from plans/plotting_prep.py directly"
        ) from exc


def render_line_plot(
    pdf, x: str, y: str, series: str, out_path: str, title: str | None = None
) -> str:
    """One line per ``series`` value over ``x`` (the reference's
    line_plot, Plotting_Functions.py:818–905). ``pdf`` is a collected
    pandas frame — rendering is a driver-side sink by design."""
    plt = _matplotlib()
    fig, ax = plt.subplots(figsize=(10, 5))
    for key, grp in pdf.sort_values(x).groupby(series):
        ax.plot(grp[x], grp[y], label=str(key))
    ax.set_xlabel(x)
    ax.set_ylabel(y)
    if title:
        ax.set_title(title)
    ax.legend(loc="best", fontsize="small")
    fig.autofmt_xdate()
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path


def render_heatmap(
    pdf, index: str, out_path: str, title: str | None = None
) -> str:
    """Week×key matrix heatmap (the reference's TS_Heatmap,
    Plotting_Functions.py:907–1024): ``pdf`` is the wide pivot
    (reshape_pivot_wide's sink shape) with ``index`` as the row label
    column and week columns as values."""
    plt = _matplotlib()
    cols = [c for c in pdf.columns if c != index]
    mat = pdf[cols].fillna(0).to_numpy()
    fig, ax = plt.subplots(figsize=(max(6, len(cols)), max(4, len(pdf) / 2)))
    im = ax.imshow(mat, aspect="auto", cmap="viridis")
    ax.set_xticks(range(len(cols)), cols, rotation=45, ha="right")
    ax.set_yticks(range(len(pdf)), pdf[index].astype(str))
    fig.colorbar(im, ax=ax)
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
