"""Ahead-of-time "engine" builds for the online perception stages.

Role parity with the reference's TensorRT engine builders
(`system/build_tools/build_solo.cpp`, `build_raft.cpp`: ONNX ->
serialized .engine deserialized at startup, detector2d.cpp:116-148).
The TPU-native equivalents are:

  * **Portable artifact**: `jax.export` serializes the jitted stage
    (backbone + heads + fused decode) as versioned StableHLO bytes —
    the ONNX analogue, but with the postprocess already fused in. The
    runtime deserializes and calls it without tracing Python.
  * **Compiled executable**: XLA's persistent compilation cache
    (`dynamic_vins_tpu.enable_compile_cache()`) — the .engine
    analogue. `--warm` compiles every exported stage once on the
    current backend so later processes start warm (first TPU compiles
    through the tunneled backend take minutes; warm starts take
    seconds — CLAUDE.md).

    python -m dynamic_vins_tpu.tools.build_engines \
        --out /tmp/engines --hw 480 752 --tasks solo,stereo,flow --warm
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sds_like(tree):
    return jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(jnp.shape(a), a.dtype), tree)


def stage_fn(task: str, image_hw, intrinsics=None, dtype=jnp.float32):
    """(jitted fn(params, *imgs), params, example input SDS list)."""
    from dynamic_vins_tpu.models import layers, pretrained

    # the online wrappers' _run normalize + batch internally: their
    # image inputs are raw [H,W] grayscale frames
    img = (jax.ShapeDtypeStruct(tuple(image_hw), dtype)
           if image_hw is not None else None)
    if task == "solo":
        wrap = pretrained.load_online("solo", image_hw, dtype=dtype)
        return wrap._run, wrap.params, [img]
    if task == "det3d":
        intr = intrinsics or (721.5377, 721.5377, 609.5593, 172.854)
        wrap = pretrained.load_online("det3d", image_hw,
                                      intrinsics=intr, dtype=dtype)
        return wrap._run, wrap.params, [img]
    if task == "stereo":
        wrap = pretrained.load_online("stereo", image_hw, dtype=dtype)
        return wrap._run, wrap.params, [img, img]
    if task == "flow":
        wrap = pretrained.load_online("flow", image_hw, dtype=dtype)
        return wrap._run, wrap.params, [img, img]
    if task == "reid":
        wrap = pretrained.load_online("reid", None, dtype=dtype)
        from dynamic_vins_tpu.models.reid import CROP_HW

        crops = jax.ShapeDtypeStruct(
            (wrap.max_boxes,) + CROP_HW + (3,), dtype)
        return wrap._run, wrap.params, [crops]
    raise ValueError(f"unknown task {task!r}")


def export_stage(task: str, image_hw, out_dir: str,
                 intrinsics=None) -> str:
    """Serialize one stage to `<out_dir>/<task>.stablehlo`."""
    from jax import export as jexport

    fn, params, inputs = stage_fn(task, image_hw, intrinsics)
    exp = jexport.export(jax.jit(fn))(_sds_like(params), *inputs)
    path = os.path.join(out_dir, f"{task}.stablehlo")
    os.makedirs(out_dir, exist_ok=True)
    with open(path, "wb") as f:
        f.write(exp.serialize())
    return path


def load_engine(path: str):
    """Deserialize an exported stage -> callable(params, *imgs)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return exp.call


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--hw", type=int, nargs=2, default=(480, 752))
    ap.add_argument("--tasks", default="solo,det3d,stereo,flow,reid")
    ap.add_argument("--warm", action="store_true",
                    help="also compile each stage on this backend to "
                         "populate the persistent XLA compile cache")
    args = ap.parse_args(argv)

    import dynamic_vins_tpu
    dynamic_vins_tpu.enable_compile_cache()

    for task in [t.strip() for t in args.tasks.split(",") if t.strip()]:
        t0 = time.perf_counter()
        path = export_stage(task, tuple(args.hw), args.out)
        msg = f"{task}: exported {os.path.getsize(path)} bytes"
        if args.warm:
            fn, params, inputs = stage_fn(task, tuple(args.hw))
            zeros = [jnp.zeros(s.shape, s.dtype) for s in inputs]
            jax.block_until_ready(fn(params, *zeros))
            msg += " + compiled"
        print(f"{msg} ({time.perf_counter() - t0:.1f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
