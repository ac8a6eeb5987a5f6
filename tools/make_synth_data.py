#!/usr/bin/env python
"""Generate structured synthetic video datasets (LQGTVID layout).

Richer than round-1's moving blobs: textured sprites (sinusoid gratings,
checkers, gaussian bumps) moving over drifting multi-scale background
gradients with global camera pan, plus per-clip photometric variation.
Content is band-limited-ish but with sharp sprite edges, so a 4x
rescaler has real high-frequency structure to preserve.

Layout matches data/util.py:59-87 expectations: <root>/<clip>/im1.png...
imN.png plus a <root>/list.txt naming the clips.

Usage:
  python tools/make_synth_data.py --root /tmp/synth_train --clips 60 \
      --frames 20 --height 160 --width 160
"""

import argparse
import os

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _grating(h, w, fx, fy, phase):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return 0.5 + 0.5 * np.sin(2 * np.pi * (fx * xx / w + fy * yy / h) + phase)


def _checker(h, w, cell):
    yy, xx = np.mgrid[0:h, 0:w]
    return (((yy // cell) + (xx // cell)) % 2).astype(np.float32)


def _bump(h, w, sigma):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    cy, cx = (h - 1) / 2, (w - 1) / 2
    return np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2)))


def render_clip(rng, frames, h, w):
    pad = 32
    H, W = h + 2 * pad, w + 2 * pad
    # background: 3 drifting low-frequency gratings, one per channel twist
    bg_specs = [(rng.uniform(0.5, 3), rng.uniform(0.5, 3),
                 rng.uniform(0, 2 * np.pi), rng.uniform(-2, 2),
                 rng.uniform(-2, 2)) for _ in range(3)]
    n_sprites = rng.integers(3, 7)
    sprites = []
    for _ in range(n_sprites):
        size = int(rng.integers(16, 48))
        kind = rng.integers(0, 3)
        if kind == 0:
            tex = _grating(size, size, rng.uniform(2, 8), rng.uniform(2, 8),
                           rng.uniform(0, 2 * np.pi))
        elif kind == 1:
            tex = _checker(size, size, int(rng.integers(2, 7)))
        else:
            tex = _bump(size, size, size / rng.uniform(3, 6))
        color = rng.uniform(0.2, 1.0, size=3).astype(np.float32)
        pos = rng.uniform([0, 0], [H - size, W - size])
        vel = rng.uniform(-3.0, 3.0, size=2)
        mask = _bump(size, size, size / 2.2) > 0.35
        sprites.append([tex, color, pos, vel, size, mask])
    cam_vel = rng.uniform(-1.5, 1.5, size=2)
    cam = np.array([pad / 2, pad / 2], np.float32)
    gain = rng.uniform(0.85, 1.0)

    out = []
    for t in range(frames):
        frame = np.zeros((H, W, 3), np.float32)
        for c, (fx, fy, ph, vx, vy) in enumerate(bg_specs):
            frame[..., c] = 0.25 + 0.45 * _grating(
                H, W, fx, fy, ph + 0.15 * t * (vx + vy)
            )
        for sp in sprites:
            tex, color, pos, vel, size, mask = sp
            y0, x0 = int(round(pos[0])), int(round(pos[1]))
            y0 = max(0, min(H - size, y0))
            x0 = max(0, min(W - size, x0))
            region = frame[y0:y0 + size, x0:x0 + size]
            blend = tex[..., None] * color[None, None]
            region[mask] = 0.3 * region[mask] + 0.7 * blend[mask]
            pos += vel
            if not (0 <= pos[0] <= H - size):
                vel[0] = -vel[0]
            if not (0 <= pos[1] <= W - size):
                vel[1] = -vel[1]
        cy, cx = (cam + cam_vel * t).astype(int)
        cy = max(0, min(2 * pad - 1, cy))
        cx = max(0, min(2 * pad - 1, cx))
        crop = frame[cy:cy + h, cx:cx + w]
        out.append(np.clip(crop * gain, 0, 1))
    return out


def write_dataset(root, clips, frames, h, w, seed=0):
    os.makedirs(root, exist_ok=True)
    names = []
    rng = np.random.default_rng(seed)
    for v in range(clips):
        name = f"clip{v:03d}"
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        for i, fr in enumerate(render_clip(rng, frames, h, w)):
            img = (fr * 255 + 0.5).astype(np.uint8)[..., ::-1]  # RGB->BGR
            cv2.imwrite(os.path.join(d, f"im{i + 1}.png"), img)
        names.append(name)
    with open(os.path.join(root, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    return names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--clips", type=int, default=60)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--height", type=int, default=160)
    ap.add_argument("--width", type=int, default=160)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    names = write_dataset(args.root, args.clips, args.frames,
                          args.height, args.width, args.seed)
    print(f"wrote {len(names)} clips to {args.root}")


if __name__ == "__main__":
    main()
