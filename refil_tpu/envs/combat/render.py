"""Host-side renderer for the combat envs.

Parity target: reference ``starcraft2custom.py:1560-1633`` (matplotlib
circles + facing + health/shield bars). TPU-native split: the jitted rollout
records a compact per-step render-state pytree on device (positions, healths,
types); frames are drawn host-side afterwards — no host<->device chatter
inside the episode loop.
"""
from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from . import units as U

_ALLY_COLORS = ["#2e7dd1", "#1fa774", "#7d5fd3", "#2aa8b8", "#4666d1"]
_ENEMY_COLORS = ["#d14b4b", "#d1812e", "#b83a70", "#a0522d", "#c2352f"]


def render_frame(rs: Dict[str, np.ndarray], b: int, map_size: float,
                 dpi: int = 48, size: float = 8.0) -> np.ndarray:
    """Draw one env (batch element ``b``) of one recorded step. Returns an
    RGB uint8 array."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    from matplotlib.backends.backend_agg import FigureCanvasAgg
    from matplotlib.figure import Figure
    import matplotlib.patches as mp

    fig = Figure(figsize=(size, size), dpi=dpi)
    canvas = FigureCanvasAgg(fig)
    ax = fig.gca()
    ax.set_xlim(0, map_size)
    ax.set_ylim(0, map_size)
    ax.axis("off")

    pos = rs["pos"][b]
    health = rs["health"][b]
    shield = rs["shield"][b]
    hmax = rs["health_max"][b]
    smax = rs["shield_max"][b]
    types = rs["type"][b]
    active = rs["active"][b]
    is_ally = rs["is_ally"][b]

    for i in range(pos.shape[0]):
        if not active[i] or health[i] <= 0:
            continue
        t = int(types[i])
        color = (
            _ALLY_COLORS[t % len(_ALLY_COLORS)]
            if is_ally[i]
            else _ENEMY_COLORS[t % len(_ENEMY_COLORS)]
        )
        r = 0.4 + 0.08 * np.sqrt(hmax[i])
        ax.add_patch(
            mp.Circle(pos[i], r, linewidth=2, edgecolor="black", facecolor=color)
        )
        # health bar (reference :1592-1600)
        ax.add_patch(
            mp.Rectangle(
                (pos[i, 0] - r, pos[i, 1] + r), 2 * r * health[i] / max(hmax[i], 1e-6),
                0.3, facecolor="green", alpha=0.75,
            )
        )
        if smax[i] > 0:
            ax.add_patch(
                mp.Rectangle(
                    (pos[i, 0] - r, pos[i, 1] + r + 0.35),
                    2 * r * shield[i] / smax[i],
                    0.3, facecolor="blue", alpha=0.75,
                )
            )
        ax.annotate(
            U.UNIT_NAMES[t][:3], pos[i], ha="center", va="center", fontsize=7
        )

    canvas.draw()
    buf = np.asarray(canvas.buffer_rgba())[:, :, :3]
    return buf.copy()


def frames_for_env(recorded: List[Dict[str, np.ndarray]], b: int,
                   map_size: float) -> List[np.ndarray]:
    return [render_frame(rs, b, map_size) for rs in recorded]


def save_video(path: str, frames: List[np.ndarray], fps: int = 2) -> str:
    """mp4 via imageio/ffmpeg when available, else an animated GIF
    (this image ships imageio without the FFMPEG plugin). Returns the path
    actually written."""
    import imageio

    try:
        with imageio.get_writer(path, format="FFMPEG", mode="I", fps=fps,
                                codec="h264", quality=10) as w:
            for f in frames:
                w.append_data(f)
        return path
    except ImportError:
        gif = path.rsplit(".", 1)[0] + ".gif"
        imageio.mimsave(gif, frames, format="GIF", duration=1.0 / fps)
        return gif


def save_replay(path: str, recorded: List[Dict[str, np.ndarray]]) -> None:
    """The stand-in's replay format: the full recorded render-state trajectory
    as one npz (reference ``save_replay`` stores an SC2 replay file)."""
    flat = {}
    for k in recorded[0]:
        flat[k] = np.stack([rs[k] for rs in recorded])
    np.savez_compressed(path, **flat)
