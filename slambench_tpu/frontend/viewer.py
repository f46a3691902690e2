"""Lightweight visual front-end: the 2x2 diagnostic tile of the
reference GUIs, rendered to PNG files (and an auto-refreshing HTML
index) instead of a GLUT/Qt window.

Equivalent surface to the reference's GLUT ``drawthem`` 2x2 layout
(reference: kfusion/include/draw.h:50-108 — RGB/depth/track/volume
tiles) and the Qt viewer grid (reference: qt/MainWindow.cpp); TPU hosts
are headless, so the streams land on disk where a browser/notebook can
watch them.

Usage:
  python -m slambench_tpu.frontend.viewer -i scene.raw --out-dir /tmp/view \
      [same pipeline flags as the benchmark] [--every N]
"""

from __future__ import annotations

import os
import sys

import numpy as np

INDEX_HTML = """<!doctype html>
<html><head><meta http-equiv="refresh" content="1">
<title>slambench_tpu viewer</title></head>
<body style="background:#222;color:#eee;font-family:monospace">
<h3>slambench_tpu — live diagnostic streams</h3>
<img src="latest.png" style="image-rendering:pixelated;width:90%%">
</body></html>
"""


def save_tile(path: str, depth_rgba, track_rgba, volume_rgba,
              raw_depth=None) -> None:
    """Compose the 2x2 tile (raw depth colormap / filtered depth /
    track diagnostics / volume render) and write a PNG."""
    try:
        from PIL import Image
    except ImportError:
        return
    h, w = depth_rgba.shape[:2]
    grid = np.zeros((2 * h, 2 * w, 3), np.uint8)
    top_left = (np.asarray(raw_depth)[..., :3] if raw_depth is not None
                else np.asarray(depth_rgba)[..., :3])
    grid[:h, :w] = top_left
    grid[:h, w:] = np.asarray(depth_rgba)[..., :3]
    grid[h:, :w] = np.asarray(track_rgba)[..., :3]
    grid[h:, w:] = np.asarray(volume_rgba)[..., :3]
    Image.fromarray(grid).save(path)


def run_viewer(argv=None) -> int:
    import jax.numpy as jnp
    from slambench_tpu.config import parse_args
    from slambench_tpu.io.readers import make_reader
    from slambench_tpu.pipeline import KFusion

    argv = list(sys.argv[1:] if argv is None else argv)
    out_dir = "/tmp/slambench_tpu_view"
    every = 4
    if "--out-dir" in argv:
        i = argv.index("--out-dir")
        out_dir = argv[i + 1]
        del argv[i:i + 2]
    if "--every" in argv:
        i = argv.index("--every")
        every = int(argv[i + 1])
        del argv[i:i + 2]

    config = parse_args(argv)
    reader = make_reader(config)
    if reader is None:
        print("No input found.", file=sys.stderr)
        return 1
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "index.html"), "w") as f:
        f.write(INDEX_HTML)

    in_w, in_h = reader.get_input_size()
    ratio = config.compute_size_ratio
    W, H = in_w // ratio, in_h // ratio
    camera = tuple(c / ratio for c in (
        config.camera if config.camera_overrided else reader.get_k()))
    kf = KFusion((W, H), config.volume_resolution, config.volume_size,
                 config.init_pose, config.pyramid, camera,
                 mu=config.mu, icp_threshold=config.icp_threshold)
    state = kf.init_state()

    frame = 0
    while True:
        depth = reader.read_next_depth_frame()
        if depth is None:
            break
        state = kf.process_frame(
            state, jnp.asarray(np.ascontiguousarray(depth)), frame,
            config.tracking_rate, config.integration_rate)
        if frame % every == 0:
            d_img = np.asarray(kf.render_depth_image(state))
            t_img = np.asarray(kf.render_track_image(state))
            v_img = np.asarray(kf.render_volume_image(state))
            path = os.path.join(out_dir, f"frame_{frame:06d}.png")
            save_tile(path, d_img, t_img, v_img)
            latest = os.path.join(out_dir, "latest.png")
            try:
                if os.path.exists(latest):
                    os.unlink(latest)
                os.link(path, latest)
            except OSError:
                pass
            print(f"frame {frame} -> {path}", file=sys.stderr)
        frame += 1
    return 0


if __name__ == "__main__":
    raise SystemExit(run_viewer())
