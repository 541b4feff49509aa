"""BEV scene rendering and video recording.

Host-side counterpart of the reference's visualization stack
(rift/gym_carla/visualization/: pygame BEV rasterizer bev_render.py:81-563,
matplotlib nuPlan-style scene render with candidate trajectories and
reference lines nuplan_scenario_render.py:53-351, mp4 writer
video_render.py:78). Renders from streamed SimState snapshots — the sim
never blocks on drawing. Output: PNG frames and an animated GIF (no ffmpeg
in this image; Pillow writes the animation).
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.patches import Polygon as MplPolygon

from ..geometry.obb import box_corners
from ..map.tensor_map import TensorMap

EGO_COLOR = "#2ca02c"
CBV_COLOR = "#d62728"
BV_COLOR = "#1f77b4"
LANE_COLOR = "#cccccc"
EDGE_COLOR = "#999999"
ROUTE_COLOR = "#ff7f0e"


class BEVRenderer:
    def __init__(self, tmap: TensorMap, view_radius: float = 80.0, figsize=(8, 8)):
        self.tmap = tmap
        self.view_radius = view_radius
        self.figsize = figsize
        self._centerline = np.asarray(tmap.centerline)
        self._left = np.asarray(tmap.left_edge)
        self._right = np.asarray(tmap.right_edge)
        self._valid = np.asarray(tmap.valid)

    def render(
        self,
        state,
        scenario: int = 0,
        route: np.ndarray | None = None,
        candidates: np.ndarray | None = None,  # [K, T, 2] world frame
        reference_lines: np.ndarray | None = None,  # [R, N, 2] + mask via nan
        weather: dict | None = None,  # Weather.at(pct) numeric attributes
        ax=None,
    ):
        """Draw one scenario centered on its ego. Returns the figure."""
        own_fig = ax is None
        if own_fig:
            fig, ax = plt.subplots(figsize=self.figsize)
        else:
            fig = ax.figure

        pos = np.asarray(state.pos[scenario])
        heading = np.asarray(state.heading[scenario])
        alive = np.asarray(state.alive[scenario])
        is_cbv = np.asarray(state.is_cbv[scenario])
        shape = np.asarray(state.shape[scenario])
        center = pos[0]

        # lanes within view
        mid = self._centerline[:, self._centerline.shape[1] // 2]
        near = (
            np.linalg.norm(mid - center, axis=-1) < self.view_radius * 1.5
        ) & self._valid
        for li in np.flatnonzero(near):
            ax.plot(*self._centerline[li].T, color=LANE_COLOR, lw=0.8, zorder=1)
            ax.plot(*self._left[li].T, color=EDGE_COLOR, lw=0.5, zorder=1)
            ax.plot(*self._right[li].T, color=EDGE_COLOR, lw=0.5, zorder=1)

        if route is not None:
            ax.plot(route[:, 0], route[:, 1], color=ROUTE_COLOR, lw=1.5,
                    alpha=0.7, zorder=2)

        if reference_lines is not None:
            for line in reference_lines:
                ax.plot(line[:, 0], line[:, 1], "--", color="#9467bd",
                        lw=1.0, alpha=0.8, zorder=2)

        if candidates is not None:
            for tr in candidates:
                ax.plot(tr[:, 0], tr[:, 1], color="#17becf", lw=0.7,
                        alpha=0.5, zorder=3)

        corners = np.asarray(
            box_corners(pos, heading, shape)
        )  # [A, 4, 2]
        for a in np.flatnonzero(alive):
            color = EGO_COLOR if a == 0 else (CBV_COLOR if is_cbv[a] else BV_COLOR)
            ax.add_patch(
                MplPolygon(corners[a], closed=True, facecolor=color,
                           edgecolor="black", lw=0.5, zorder=4)
            )
            # heading tick
            tip = pos[a] + 3.0 * np.array([np.cos(heading[a]), np.sin(heading[a])])
            ax.plot([pos[a, 0], tip[0]], [pos[a, 1], tip[1]], color="black",
                    lw=0.5, zorder=4)

        ax.set_xlim(center[0] - self.view_radius, center[0] + self.view_radius)
        ax.set_ylim(center[1] - self.view_radius, center[1] + self.view_radius)
        ax.set_aspect("equal")
        title = f"tick {int(state.tick[scenario])}"
        if weather:
            # applied weather: rain/fog dim the scene (BEV stand-in for the
            # leaderboard's dynamic weather, env_wrapper.py:59-73); the HUD
            # line records what was applied
            rain = float(weather.get("precipitation", 0.0)) / 100.0
            fog = float(weather.get("fog_density", 0.0)) / 100.0
            cloud = float(weather.get("cloudiness", 0.0)) / 100.0
            dim = min(0.45, 0.35 * rain + 0.3 * fog + 0.1 * cloud)
            if dim > 0.0:
                ax.add_patch(
                    MplPolygon(
                        np.array([
                            [center[0] - 2 * self.view_radius,
                             center[1] - 2 * self.view_radius],
                            [center[0] + 2 * self.view_radius,
                             center[1] - 2 * self.view_radius],
                            [center[0] + 2 * self.view_radius,
                             center[1] + 2 * self.view_radius],
                            [center[0] - 2 * self.view_radius,
                             center[1] + 2 * self.view_radius],
                        ]),
                        closed=True, facecolor="#3b4a63", alpha=dim,
                        edgecolor="none", zorder=6,
                    )
                )
            parts = [
                f"{k.replace('_', ' ')} {float(v):.0f}"
                for k, v in sorted(weather.items())
                if k in ("cloudiness", "precipitation", "fog_density",
                         "wetness", "sun_altitude_angle") and float(v) != 0.0
            ]
            if parts:
                title += "  |  " + ", ".join(parts)
        ax.set_title(title, fontsize=9)
        return fig


class VideoRecorder:
    """Collects frames during a rollout; writes PNGs and a GIF."""

    def __init__(self, tmap: TensorMap, out_dir: str, every_n_ticks: int = 5,
                 **renderer_kw):
        self.renderer = BEVRenderer(tmap, **renderer_kw)
        self.out_dir = out_dir
        self.every = every_n_ticks
        self.frames: list[np.ndarray] = []
        os.makedirs(out_dir, exist_ok=True)

    def maybe_capture(self, state, scenario: int = 0, **render_kw):
        if int(state.tick[scenario]) % self.every != 0:
            return
        fig = self.renderer.render(state, scenario, **render_kw)
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())[..., :3]
        self.frames.append(buf.copy())
        plt.close(fig)

    def save(self, name: str = "episode"):
        """Write the captured frames: mp4 when an encoder is available
        (cv2's bundled mp4v — the reference's imageio-ffmpeg mp4 writer,
        video_render.py:78), GIF fallback otherwise, plus a last-frame PNG."""
        if not self.frames:
            return None
        from PIL import Image

        path = self._save_mp4(name)
        if path is None:
            imgs = [Image.fromarray(f) for f in self.frames]
            path = os.path.join(self.out_dir, f"{name}.gif")
            imgs[0].save(
                path, save_all=True, append_images=imgs[1:], duration=100,
                loop=0,
            )
        Image.fromarray(self.frames[-1]).save(
            os.path.join(self.out_dir, f"{name}_last.png")
        )
        self.frames = []
        return path

    def _save_mp4(self, name: str, fps: int = 10):
        try:
            import cv2
        except ImportError:
            return None
        path = os.path.join(self.out_dir, f"{name}.mp4")
        h, w = self.frames[0].shape[:2]
        vw = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
        )
        if not vw.isOpened():
            return None
        for f in self.frames:
            vw.write(f[..., ::-1])  # RGB -> BGR
        vw.release()
        return path
