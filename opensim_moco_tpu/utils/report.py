"""Multi-page PDF trajectory report.

The analogue of the reference's Python report utility
(Moco/Bindings/Python/report.py:110-567): given one or more
trajectories/solutions, produce a PDF where every state, control,
multiplier, derivative and parameter is plotted against time, grouped a few
axes per page, with left/right-limb quantities overlaid on one axes
(bilateralize, report.py:66-94) and an optional reference table drawn
behind the solutions.

Usage::

    from opensim_moco_tpu.utils.report import generate_report
    generate_report(solution, "report.pdf", reference=ref_table,
                    labels=["solution"], title="gait2d tracking")

or from the CLI::

    python -m opensim_moco_tpu report solution.sto --out report.pdf
"""

from __future__ import annotations

import math
import re

import numpy as np

_PLOTS_PER_PAGE = 9
_GRID = (3, 3)


def _bilateralize(name: str):
    """Group key for left/right pairs: '/jointset/hip_r/...' and the _l
    twin share one axes (reference report.py:66-94)."""
    for suffix in ("_r", "_l"):
        # replace a trailing _r/_l on any path segment
        m = re.sub(rf"{suffix}(?=/|$)", "", name)
        if m != name:
            return m
    return name


def _short(name: str, max_len: int = 38):
    return name if len(name) <= max_len else "..." + name[-(max_len - 3):]


def _column_groups(names):
    """Ordered {group_key: [column names]} with bilateral merging."""
    groups: dict[str, list[str]] = {}
    for n in names:
        groups.setdefault(_bilateralize(n), []).append(n)
    return groups


def generate_report(trajectories, path, labels=None, reference=None,
                    title=None, dpi=120):
    """Write a multi-page PDF report for one or more trajectories.

    trajectories: a Trajectory/Solution or list thereof (overlaid).
    reference: optional StoTable plotted as dashed black behind solutions
      for any matching column (the reference's ref_files option).
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.backends.backend_pdf import PdfPages

    if not isinstance(trajectories, (list, tuple)):
        trajectories = [trajectories]
    if labels is None:
        labels = [f"trajectory {i}" for i in range(len(trajectories))]
    colors = plt.rcParams["axes.prop_cycle"].by_key()["color"]

    sections = []  # (section title, getter, column names)
    t0 = trajectories[0]
    # index directly into the arrays: reports must work on sealed
    # (failed-solve) solutions too, like the reference report utility
    if t0.state_names:
        sections.append(
            ("States",
             lambda tr, n: tr.states[:, list(tr.state_names).index(n)],
             list(t0.state_names)))
    if t0.control_names:
        sections.append(
            ("Controls",
             lambda tr, n: tr.controls[:, list(tr.control_names).index(n)],
             list(t0.control_names)))
    mult_names = list(getattr(t0, "multiplier_names", []) or [])
    if mult_names:
        sections.append(
            ("Multipliers",
             lambda tr, n: tr.multipliers[:,
                                          list(tr.multiplier_names).index(n)],
             mult_names))

    ref_cols = set(reference.column_names) if reference is not None else set()

    with PdfPages(path) as pdf:
        for sec_title, getter, names in sections:
            groups = _column_groups(names)
            keys = list(groups)
            n_pages = math.ceil(len(keys) / _PLOTS_PER_PAGE)
            for page in range(n_pages):
                fig, axes = plt.subplots(*_GRID, figsize=(8.5, 11))
                axes = np.ravel(axes)
                head = f"{sec_title} (page {page + 1}/{n_pages})"
                if title:
                    head = f"{title} — {head}"
                fig.suptitle(head, fontsize=10)
                page_keys = keys[page * _PLOTS_PER_PAGE:
                                 (page + 1) * _PLOTS_PER_PAGE]
                for ax, key in zip(axes, page_keys):
                    for col in groups[key]:
                        if col in ref_cols:
                            ax.plot(np.asarray(reference.time),
                                    np.asarray(reference.column(col)),
                                    "k--", lw=1.0, label="reference")
                        for tr, lab, c in zip(trajectories, labels, colors):
                            style = "-" if col.endswith(("_r",)) or \
                                col == key else "--"
                            suffix = ""
                            if col != key:
                                suffix = " (" + col.replace(
                                    key.rstrip("/"), "").strip("_/") + ")"
                            ax.plot(np.asarray(tr.time),
                                    np.asarray(getter(tr, col)), style,
                                    color=c, lw=1.2,
                                    label=_short(lab + suffix, 24))
                    ax.set_title(_short(key), fontsize=7)
                    ax.tick_params(labelsize=6)
                    ax.grid(True, alpha=0.3)
                    if len(groups[key]) > 1 or len(trajectories) > 1 or \
                            (groups[key][0] in ref_cols):
                        ax.legend(fontsize=5)
                for ax in axes[len(page_keys):]:
                    ax.axis("off")
                fig.tight_layout(rect=(0, 0, 1, 0.97))
                pdf.savefig(fig, dpi=dpi)
                plt.close(fig)

        # final page: solve metadata (objective/breakdown live in the STO
        # header in the reference, MocoTrajectory.h:736-738)
        meta_lines = []
        for tr, lab in zip(trajectories, labels):
            meta_lines.append(lab)
            for attr in ("success", "objective", "status", "num_iterations",
                         "solver_duration", "kkt_error"):
                v = getattr(tr, attr, None)
                if v is not None:
                    meta_lines.append(f"  {attr}: {v}")
            if getattr(tr, "parameters", None) is not None and \
                    getattr(tr, "parameter_names", None):
                for pn, pv in zip(tr.parameter_names, tr.parameters):
                    meta_lines.append(f"  parameter {pn}: {float(pv):.6g}")
        if meta_lines:
            fig = plt.figure(figsize=(8.5, 11))
            fig.text(0.08, 0.95, "\n".join(meta_lines), fontsize=8,
                     va="top", family="monospace")
            pdf.savefig(fig)
            plt.close(fig)
    return path
