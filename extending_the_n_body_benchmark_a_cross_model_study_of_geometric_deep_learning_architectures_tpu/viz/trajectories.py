"""Trajectory visualization: interactive HTML, animations, PDF aggregation.

Covers the reference's visualization toolchain (SURVEY.md §2 Visualization
row) without plotly/PyMuPDF (not in this image):

* :func:`interactive_trajectory_html` — self-contained HTML with a canvas
  animation of GT-vs-predicted trajectories (role of
  ``interactive_plotly_offline_plot_multi_trajectory``,
  ``visualization_utils.py:1225+``).
* :func:`animate_trajectory` — mp4 (ffmpeg) or GIF (pillow) fallback
  (role of ``helper_scripts/vis_script.py``).
* :func:`aggregate_checkpoint_plots_pdf` — multi-page PDF of every
  checkpoint's macro plots (role of
  ``helper_scripts/aggregate_checkpoint_plots.py`` which used PyMuPDF).
* :func:`plot_trajectories_3d` — static 3D matplotlib figure.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _finite_bounds(pts: np.ndarray, pad: float = 1.0) -> tuple:
    """(lo, hi) over the finite entries of ``pts``; safe on exploded
    rollouts whose later frames are NaN/inf (rollout freeze semantics)."""
    finite = pts[np.isfinite(pts)]
    if finite.size == 0:
        return -pad, pad
    lo, hi = float(finite.min()) - pad, float(finite.max()) + pad
    if hi <= lo:
        hi = lo + 2 * pad
    return lo, hi


def plot_trajectories_3d(
    save_dir: str,
    loc: np.ndarray,
    sim_index: int = 0,
    filename: str = "trajectory_3d.png",
    title: str = "",
) -> str:
    """loc ``[S, T, N, 3]`` -> static 3D trajectory plot of one sim."""
    os.makedirs(save_dir, exist_ok=True)
    fig = plt.figure(figsize=(8, 8))
    ax = fig.add_subplot(projection="3d")
    for b in range(loc.shape[2]):
        ax.plot(loc[sim_index, :, b, 0], loc[sim_index, :, b, 1],
                loc[sim_index, :, b, 2], alpha=0.7, lw=0.8)
        ax.scatter(*loc[sim_index, -1, b], s=18)
    ax.set_title(title or f"sim {sim_index}")
    path = os.path.join(save_dir, filename)
    fig.savefig(path)
    plt.close(fig)
    return path


def interactive_trajectory_html(
    save_dir: str,
    loc_actual: np.ndarray,
    loc_pred: Optional[np.ndarray] = None,
    sim_index: int = 0,
    filename: str = "trajectory.html",
    max_steps: int = 1000,
) -> str:
    """Self-contained HTML canvas animation (no external JS)."""
    os.makedirs(save_dir, exist_ok=True)

    def prep(loc):
        a = np.asarray(loc[sim_index], dtype=np.float64)
        if a.shape[0] > max_steps:
            a = a[np.linspace(0, a.shape[0] - 1, max_steps).astype(int)]
        return a[..., :2]  # project to 2D for the canvas

    tracks = {"ground truth": prep(loc_actual)}
    if loc_pred is not None:
        tracks["predicted"] = prep(loc_pred)
    allpts = np.concatenate(list(tracks.values()), axis=0).reshape(-1, 2)
    lo, hi = _finite_bounds(allpts)
    payload = {
        k: np.round(v, 4).tolist() for k, v in tracks.items()
    }
    html = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>trajectory sim {sim_index}</title></head><body>
<canvas id="c" width="800" height="800" style="border:1px solid #999"></canvas>
<div><button onclick="playing=!playing">play/pause</button>
<input type="range" id="s" min="0" max="0" value="0" style="width:600px"></div>
<script>
const data = {json.dumps(payload)};
const lo = {lo}, hi = {hi};
const colors = {{"ground truth": "#2b6cb0", "predicted": "#c53030"}};
const ctx = document.getElementById('c').getContext('2d');
const T = Object.values(data)[0].length;
document.getElementById('s').max = T - 1;
let t = 0, playing = true;
function sc(p) {{ return [(p[0]-lo)/(hi-lo)*800, 800-(p[1]-lo)/(hi-lo)*800]; }}
function draw() {{
  ctx.clearRect(0,0,800,800);
  for (const [name, track] of Object.entries(data)) {{
    ctx.strokeStyle = colors[name] || '#555'; ctx.fillStyle = ctx.strokeStyle;
    const N = track[0].length;
    for (let b = 0; b < N; b++) {{
      ctx.beginPath();
      for (let i = Math.max(0, t-100); i <= t; i++) {{
        const [x, y] = sc(track[i][b]);
        if (i === Math.max(0, t-100)) ctx.moveTo(x, y); else ctx.lineTo(x, y);
      }}
      ctx.stroke();
      const [x, y] = sc(track[t][b]);
      ctx.beginPath(); ctx.arc(x, y, 4, 0, 6.283); ctx.fill();
    }}
  }}
  ctx.fillStyle = '#000'; ctx.fillText('t = ' + t + ' / ' + (T-1), 10, 15);
  let ly = 30;
  for (const name of Object.keys(data)) {{
    ctx.fillStyle = colors[name] || '#555'; ctx.fillText(name, 10, ly); ly += 15;
  }}
}}
setInterval(() => {{ if (playing) {{ t = (t+1) % T;
  document.getElementById('s').value = t; draw(); }} }}, 30);
document.getElementById('s').oninput = (e) => {{ t = +e.target.value; draw(); }};
draw();
</script></body></html>"""
    path = os.path.join(save_dir, filename)
    with open(path, "w") as f:
        f.write(html)
    return path


def animate_trajectory(
    save_dir: str,
    loc: np.ndarray,
    sim_index: int = 0,
    filename: str = "trajectory.mp4",
    fps: int = 30,
    max_frames: int = 300,
    tail: int = 40,
) -> str:
    """mp4 via ffmpeg if available, else GIF via pillow."""
    from matplotlib import animation

    os.makedirs(save_dir, exist_ok=True)
    a = np.asarray(loc[sim_index])
    if a.shape[0] > max_frames:
        a = a[np.linspace(0, a.shape[0] - 1, max_frames).astype(int)]
    T, N, _ = a.shape

    fig, ax = plt.subplots(figsize=(6, 6))
    lo, hi = _finite_bounds(a[..., :2])
    ax.set_xlim(lo, hi)
    ax.set_ylim(lo, hi)
    lines = [ax.plot([], [], alpha=0.6, lw=1)[0] for _ in range(N)]
    dots = [ax.plot([], [], "o", ms=5)[0] for _ in range(N)]

    def update(t):
        s = max(0, t - tail)
        for b in range(N):
            lines[b].set_data(a[s : t + 1, b, 0], a[s : t + 1, b, 1])
            dots[b].set_data([a[t, b, 0]], [a[t, b, 1]])
        return lines + dots

    ani = animation.FuncAnimation(fig, update, frames=T, blit=True)
    path = os.path.join(save_dir, filename)
    try:
        ani.save(path, writer="ffmpeg", fps=fps)
    except Exception:
        path = os.path.join(save_dir, os.path.splitext(filename)[0] + ".gif")
        ani.save(path, writer="pillow", fps=min(fps, 15))
    plt.close(fig)
    return path


def aggregate_checkpoint_plots_pdf(
    run_path: str,
    patterns: Sequence[str] = ("sticking_distribution.png", "collision_distribution.png"),
    filename: str = "checkpoint_plots.pdf",
) -> Optional[str]:
    """Collect per-checkpoint PNGs into one multi-page PDF."""
    from matplotlib.backends.backend_pdf import PdfPages

    ckpt_root = os.path.join(run_path, "checkpoints")
    if not os.path.isdir(ckpt_root):
        return None
    steps = sorted((d for d in os.listdir(ckpt_root) if d.isdigit()), key=int)
    out = os.path.join(run_path, filename)
    wrote = False
    with PdfPages(out) as pdf:
        for step in steps:
            for pat in patterns:
                p = os.path.join(ckpt_root, step, pat)
                if not os.path.exists(p):
                    continue
                img = plt.imread(p)
                fig, ax = plt.subplots(figsize=(8, 8))
                ax.imshow(img)
                ax.axis("off")
                ax.set_title(f"checkpoint {step} — {pat}")
                pdf.savefig(fig)
                plt.close(fig)
                wrote = True
    if not wrote:
        # matplotlib >= 3.10 never creates a file for an empty PdfPages
        if os.path.exists(out):
            os.remove(out)
        return None
    return out
