"""Produce the shipped checkpoints under `dynamic_vins_tpu/weights/`.

The reference gets its NN weights from the mmdetection/mmdetection3d
zoos (converted by `scripts/python/conv_model_format.py`); this
container has no egress, so the shipped checkpoints are trained on the
exact-ground-truth synthetic generators (`training/data.py`) — enough
to exercise the full online perception paths with non-trivial accuracy
and to document the end-to-end training recipe. Re-run:

    python -m dynamic_vins_tpu.tools.train_shipped_weights \
        [--tasks solo,stereo,...] [--scale 1.0] [--out-dir ...]

Writes one float16-compressed .npz per task plus MANIFEST.json pinning
the model-constructor kwargs (see models/pretrained.py).
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# (cli task name, manifest model kwargs, steps, batch, lr)
RECIPES = {
    "solo": ({"num_classes": 8, "grid_sizes": [12, 8, 6, 4]},
             800, 4, 1e-3),
    "det3d": ({"num_classes": 6}, 800, 4, 1e-3),
    "stereo": ({}, 700, 4, 1e-3),
    "flow": ({}, 500, 2, 1e-3),
    "reid": ({}, 600, 16, 1e-3),
}


def compress_f16(src: str, dst: str) -> None:
    data = np.load(src)
    out = {}
    for k in data.files:
        a = data[k]
        out[k] = a.astype(np.float16) if a.dtype == np.float32 else a
    np.savez_compressed(dst, **out)


def main(argv=None):
    from dynamic_vins_tpu.models.pretrained import WEIGHTS_DIR
    from dynamic_vins_tpu.training import cli as tcli

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--tasks", default=",".join(RECIPES))
    ap.add_argument("--scale", type=float, default=1.0,
                    help="multiply step counts (quick smoke: 0.02)")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--tmp-dir", default="/tmp/dv_weights")
    args = ap.parse_args(argv)

    out_dir = os.path.abspath(args.out_dir or WEIGHTS_DIR)
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(args.tmp_dir, exist_ok=True)
    man_path = os.path.join(out_dir, "MANIFEST.json")
    manifest = {}
    if os.path.exists(man_path):
        with open(man_path) as f:
            manifest = json.load(f)

    for task in [t.strip() for t in args.tasks.split(",") if t.strip()]:
        model_kw, steps, batch, lr = RECIPES[task]
        steps = max(int(steps * args.scale), 2)
        raw = os.path.join(args.tmp_dir, f"{task}_f32.npz")
        t0 = time.perf_counter()
        tcli.main(["--task", task, "--steps", str(steps),
                   "--batch", str(batch), "--lr", str(lr),
                   "--out", raw, "--log-every", "50"])
        dst = os.path.join(out_dir, f"{task}.npz")
        compress_f16(raw, dst)
        manifest[task] = {
            "file": f"{task}.npz",
            "model": model_kw,
            "trained": {"steps": steps, "batch": batch, "lr": lr,
                        "data": "training/data.py synthetic",
                        "seconds": round(time.perf_counter() - t0, 1)},
        }
        with open(man_path, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
        print(f"[{task}] {os.path.getsize(dst) / 1e6:.2f} MB -> {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
