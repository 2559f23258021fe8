"""Render a training run's metrics JSONL as a loss-curve figure (PNG).

Usage: python tools/plot_run.py runs/evidence/metrics.jsonl [out.png] [title]

Reference-README parity: musyoku/wavenet validated by published training-loss
curves; this is the equivalent artifact for a run driven by train.py
--metrics-file (SURVEY.md §5.5).
"""

import json
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt                                  # noqa: E402

SURFACE = "#fcfcfb"
SERIES = "#2a78d6"        # categorical slot 1 (validated default palette)
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e8e7e3"


def ema(xs, a=0.05):
    out, m = [], None
    for v in xs:
        m = v if m is None else (1 - a) * m + a * v
        out.append(m)
    return out


def main():
    path = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else path.rsplit(".", 1)[0] + ".png"
    steps, loss, acc = [], [], []
    with open(path) as f:
        for line in f:
            r = json.loads(line)
            if "loss" not in r or "step" not in r:
                continue
            steps.append(r["step"])
            loss.append(r["loss"])
            acc.append(r.get("accuracy"))
    if not steps:
        sys.exit("no records")
    have_acc = all(a is not None for a in acc)

    nrows = 2 if have_acc else 1
    fig, axes = plt.subplots(nrows, 1, figsize=(8, 3.2 * nrows),
                             sharex=True, facecolor=SURFACE)
    axes = axes if nrows == 2 else [axes]

    panels = [("cross-entropy (nats/sample)", loss)]
    if have_acc:
        panels.append(("next-sample accuracy", acc))
    for ax, (label, ys) in zip(axes, panels):
        ax.set_facecolor(SURFACE)
        ax.plot(steps, ys, color=SERIES, lw=0.8, alpha=0.25)
        sm = ema(ys)
        ax.plot(steps, sm, color=SERIES, lw=2.0)
        ax.annotate(f"{sm[-1]:.3f}", (steps[-1], sm[-1]),
                    xytext=(6, 0), textcoords="offset points",
                    va="center", color=INK, fontsize=10)
        ax.set_ylabel(label, color=INK2, fontsize=10)
        ax.grid(True, color=GRID, lw=0.6)
        ax.tick_params(colors=INK2, labelsize=9)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
        ax.margins(x=0.02)
    axes[-1].set_xlabel("training step", color=INK2, fontsize=10)
    title = (sys.argv[3] if len(sys.argv) > 3 else
             "WaveNet training run")
    axes[0].set_title(title, color=INK, fontsize=11, loc="left")
    fig.tight_layout()
    fig.savefig(out, dpi=150, facecolor=SURFACE)
    print(f"wrote {out} ({len(steps)} records)")


if __name__ == "__main__":
    main()
