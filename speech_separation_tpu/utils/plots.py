"""Loss/metric curve dumps (the reference's matplotlib cells as a utility).

The reference plots Keras ``history`` inline (`uPIT_baseline.ipynb cells
33-34`, `_t2 cell 23`); here curves render from a ``fit`` history dict or a
``MetricsLogger`` JSONL file to a PNG artifact.
"""

from __future__ import annotations

import json
import pathlib

__all__ = ["plot_history", "plot_metrics_file"]


def plot_history(
    history: dict[str, list[float]],
    out_path: str | pathlib.Path,
    title: str = "training curves",
) -> pathlib.Path:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4))
    for name, values in history.items():
        ax.plot(range(1, len(values) + 1), values, label=name)
    ax.set_xlabel("epoch")
    ax.set_ylabel("value")
    ax.set_title(title)
    ax.legend()
    ax.grid(True, alpha=0.3)
    out_path = pathlib.Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(out_path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_metrics_file(
    jsonl_path: str | pathlib.Path,
    out_path: str | pathlib.Path,
    keys: list[str] | None = None,
) -> pathlib.Path:
    """Render curves from a MetricsLogger JSONL stream (x-axis: step)."""
    records = [
        json.loads(line)
        for line in pathlib.Path(jsonl_path).read_text().splitlines()
        if line.strip()
    ]
    if not records:
        raise ValueError(f"no records in {jsonl_path}")
    if keys is None:
        keys = [k for k in records[0] if k not in ("step", "wall_s")]
    history = {k: [r[k] for r in records if k in r] for k in keys}
    return plot_history(history, out_path, title=str(jsonl_path))
