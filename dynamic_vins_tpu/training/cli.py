"""Train an online perception model from the command line.

    python -m dynamic_vins_tpu.training.cli --task stereo --steps 200 \
        --out /tmp/stereo.npz [--data-parallel]

Tasks: stereo | flow | solo | det3d | reid. Data comes from the
synthetic generators in `training/data.py` (exact ground truth, no
datasets required); checkpoints load back through each model's
`params_path` argument.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def _norm(img):
    return (jnp.asarray(img) / 255.0 - 0.45) / 0.225


def build_task(task: str, hw, rng, batch: int):
    """Returns (params, loss_fn, next_batch callable)."""
    from dynamic_vins_tpu.training import data as tdata
    from dynamic_vins_tpu.training import losses

    if task == "stereo":
        from dynamic_vins_tpu.models.stereo_net import StereoNet

        model = StereoNet(max_disp=32)
        b0 = tdata.stereo_batch(rng, batch, hw, 32)
        params = model.init(jax.random.PRNGKey(0), _norm(b0[0]),
                            _norm(b0[1]))

        def loss_fn(p, b):
            left, right, disp, valid = b
            pred = model.apply(p, _norm(left), _norm(right))
            l = losses.stereo_loss(pred, disp, valid)
            return l, {"epe_px": l}

        return params, loss_fn, \
            lambda: tdata.stereo_batch(rng, batch, hw, 32)

    if task == "flow":
        from dynamic_vins_tpu.models.raft import RAFT

        model = RAFT(iters=4)
        b0 = tdata.flow_batch(rng, batch, hw)
        params = model.init(jax.random.PRNGKey(0), _norm(b0[0][:1]),
                            _norm(b0[1][:1]))

        def loss_fn(p, b):
            img1, img2, flow, valid = b
            pred = jax.vmap(
                lambda a, c: model.apply(p, a[None], c[None]))(
                _norm(img1), _norm(img2))
            l = losses.flow_loss(pred, flow, valid)
            return l, {"epe_px": l}

        return params, loss_fn, lambda: tdata.flow_batch(rng, batch, hw)

    if task == "solo":
        from dynamic_vins_tpu.models.solov2 import Solov2

        grids = (12, 8, 6, 4)
        ncls = 8
        model = Solov2(num_classes=ncls, grid_sizes=grids)
        mask_hw = (hw[0] // 4, hw[1] // 4)
        gen = lambda: tdata.seg_batch(rng, batch, hw, num_classes=ncls,
                                      grid_sizes=grids, mask_hw=mask_hw)
        b0 = gen()
        params = model.init(jax.random.PRNGKey(0), _norm(b0[0]))

        def loss_fn(p, b):
            im, ct, it, ml = b
            k, s, mf = model.apply(p, _norm(im))
            l, aux = losses.solo_loss(k, s, mf, ct, it, ml,
                                      num_classes=ncls)
            return l, {"cate": aux[0], "mask": aux[1]}

        return params, loss_fn, gen

    if task == "det3d":
        from dynamic_vins_tpu.models.det3d import FCOS3D

        ncls = 6
        model = FCOS3D(num_classes=ncls)
        gen = lambda: tdata.det3d_batch(rng, batch, hw,
                                        num_classes=ncls)
        b0 = gen()
        params = model.init(jax.random.PRNGKey(0), _norm(b0[0]))

        def loss_fn(p, b):
            im, t = b
            outs = model.apply(p, _norm(im))
            l, aux = losses.fcos3d_loss(outs, t, num_classes=ncls)
            return l, {"cls": aux[0], "ctr": aux[1], "reg": aux[2]}

        return params, loss_fn, gen

    if task == "reid":
        from dynamic_vins_tpu.models.reid import ReidNet

        model = ReidNet()
        gen = lambda: tdata.reid_batch(rng, num_ids=max(batch // 4, 2),
                                       views=4, hw=(64, 32))
        b0 = gen()
        params = model.init(jax.random.PRNGKey(0), _norm(b0[0]))

        def loss_fn(p, b):
            im, lab = b
            emb = model.apply(p, _norm(im))
            return losses.triplet_loss(emb, lab), {}

        return params, loss_fn, gen

    raise SystemExit(f"unknown task {task!r}")


def main(argv=None):
    from dynamic_vins_tpu.training import (Trainer, TrainConfig,
                                           data_parallel_mesh)

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--task", required=True,
                    choices=["stereo", "flow", "solo", "det3d", "reid"])
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--hw", type=int, nargs=2, default=(96, 128))
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out", default=None, help="checkpoint .npz path")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--data-parallel", action="store_true",
                    help="shard the batch over all local devices")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--log-every", type=int, default=20)
    args = ap.parse_args(argv)

    rng = np.random.default_rng(args.seed)
    params, loss_fn, next_batch = build_task(args.task, tuple(args.hw),
                                             rng, args.batch)
    mesh = data_parallel_mesh() if args.data_parallel else None
    tr = Trainer(loss_fn, params,
                 TrainConfig(learning_rate=args.lr,
                             total_steps=args.steps), mesh=mesh)
    if args.resume:
        tr.load(args.resume)
    t0 = time.perf_counter()
    for step in range(args.steps):
        loss, aux = tr.step(next_batch())
        if step % args.log_every == 0 or step == args.steps - 1:
            extra = " ".join(f"{k}={v:.4f}" for k, v in aux.items())
            print(f"step {step:5d}  loss {loss:.4f}  {extra}  "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)
    if args.out:
        tr.save(args.out)
        print("saved", args.out)


if __name__ == "__main__":
    main()
