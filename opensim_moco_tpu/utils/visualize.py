"""Trajectory visualization (the MocoUtilities::visualize analogue,
reference MocoUtilities.h:258, which opens the simbody-visualizer GUI).

Headless-first: renders a stick-figure animation of the multibody tree —
body origins connected along the kinematic tree, plus contact
spheres/stations and muscle path lines — to an animated GIF or a
filmstrip PNG with matplotlib. Complements the column-plot PDF report
(utils/report.py, the report.py binding analogue)."""

from __future__ import annotations

import numpy as np


def _pose_points(model, p, q):
    """World positions: body origins (nb, 3) + segment list [(i, parent)]."""
    import jax.numpy as jnp

    frames = model.mech.frames(p["mech"], jnp.asarray(q))
    origins = np.stack([np.asarray(o) for _, o in frames])
    segs = []
    for i, pa in enumerate(model.mech.parents):
        a = origins[i]
        b = np.zeros(3) if pa < 0 else origins[pa]
        segs.append((a, b))
    return origins, segs


def visualize(model, trajectory, out_path, fps=20, max_frames=60,
              plane=(0, 1), show_muscles=True):
    """Render ``trajectory`` (a Trajectory/Solution) as an animation.

    ``out_path`` ending in .gif gets an animated GIF; anything else gets a
    filmstrip PNG (frames side by side). ``plane``: world axes to project
    onto (default x-y, the sagittal plane of the gait models)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traj = trajectory
    if hasattr(traj, "unseal"):
        traj = traj.unseal()
    nq = model.mech.nq
    times = np.asarray(traj.time)
    if len(times) > max_frames:
        idx = np.linspace(0, len(times) - 1, max_frames).astype(int)
    else:
        idx = np.arange(len(times))
    p = model.default_params()
    ax0, ax1 = plane

    poses = []
    for k in idx:
        q = np.asarray(traj.states[k, :nq])
        origins, segs = _pose_points(model, p, q)
        mus = []
        if show_muscles and model.muscles:
            import jax.numpy as jnp
            frames = model.mech.frames(p["mech"], jnp.asarray(q))
            for ms in model.muscles:
                pts = [np.asarray(model._path_point_world(
                    frames, p, jnp.asarray(q), pt))
                    for pt in ms.path if pt[0] != "wrap"]
                if len(pts) >= 2:
                    mus.append(np.stack(pts))
        poses.append((origins, segs, mus))

    allpts = np.concatenate([o for o, _, _ in poses])
    lo = allpts.min(axis=0) - 0.2
    hi = allpts.max(axis=0) + 0.2

    def draw(ax, pose):
        origins, segs, mus = pose
        for a, b in segs:
            ax.plot([a[ax0], b[ax0]], [a[ax1], b[ax1]], "-", color="#444",
                    lw=2)
        ax.plot(origins[:, ax0], origins[:, ax1], "o", color="#d97706",
                ms=4)
        for m in mus:
            ax.plot(m[:, ax0], m[:, ax1], "-", color="#dc2626", lw=0.8,
                    alpha=0.7)
        ax.axhline(0.0, color="#94a3b8", lw=0.5)
        ax.set_xlim(lo[ax0], hi[ax0])
        ax.set_ylim(lo[ax1], hi[ax1])
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])

    out_path = str(out_path)
    if out_path.endswith(".gif"):
        from matplotlib.animation import FuncAnimation, PillowWriter

        fig, ax = plt.subplots(figsize=(4, 4))

        def update(i):
            ax.clear()
            draw(ax, poses[i])
            ax.set_title(f"t = {times[idx[i]]:.2f} s", fontsize=9)

        anim = FuncAnimation(fig, update, frames=len(poses))
        anim.save(out_path, writer=PillowWriter(fps=fps))
        plt.close(fig)
    else:
        ncol = min(8, len(poses))
        nrow = int(np.ceil(len(poses) / ncol))
        fig, axes = plt.subplots(nrow, ncol,
                                 figsize=(2.0 * ncol, 2.0 * nrow))
        axes = np.atleast_1d(axes).ravel()
        for ax in axes[len(poses):]:
            ax.axis("off")
        for ax, pose, k in zip(axes, poses, idx):
            draw(ax, pose)
            ax.set_title(f"{times[k]:.2f}s", fontsize=7)
        fig.tight_layout()
        fig.savefig(out_path, dpi=110)
        plt.close(fig)
    return out_path
