"""Offline tooling: artifact writers/readers round trip, the
precompute CLI (scripts/python/* parity) and AOT engine export
(build_tools parity)."""

import os

import numpy as np
import pytest


def _fake_image_dir(tmp_path, n=3, hw=(64, 96), shift=2):
    import cv2

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, hw).astype(np.uint8)
    ldir, rdir = tmp_path / "left", tmp_path / "right"
    ldir.mkdir(), rdir.mkdir()
    for i in range(n):
        img = np.roll(base, i * 3, axis=1)
        cv2.imwrite(str(ldir / f"{i:06d}.png"), img)
        cv2.imwrite(str(rdir / f"{i:06d}.png"),
                    np.roll(img, -shift, axis=1))
    return str(ldir), str(rdir)


def test_artifact_writer_reader_roundtrip(tmp_path):
    from dynamic_vins_tpu.io import perception

    seg = perception.SegResult(
        masks=np.zeros((2, 16, 24), bool),
        scores=np.array([0.9, 0.7], np.float32),
        labels=np.array([2, 7], np.int64))
    seg.masks[0, 2:8, 3:12] = True
    seg.masks[1, 9:14, 15:22] = True
    perception.write_solo_seg_pt(str(tmp_path), "000001", seg)
    back = perception.read_solo_seg_pt(str(tmp_path), "000001",
                                       score_threshold=0.5)
    assert back is not None
    np.testing.assert_array_equal(back.masks, seg.masks)
    np.testing.assert_allclose(back.scores, seg.scores)
    np.testing.assert_array_equal(back.labels, seg.labels)

    boxes = [perception.Box3D("Car", 0.8, np.array([1.0, 2.0, 10.0]),
                              np.array([1.8, 1.5, 4.2]), 0.3)]
    path = str(tmp_path / "000001.txt")
    perception.write_fcos3d_txt(path, boxes)
    back3d = perception.read_fcos3d_txt(path)
    assert len(back3d) == 1 and back3d[0].class_name == "Car"
    np.testing.assert_allclose(back3d[0].bottom_center,
                               boxes[0].bottom_center, atol=1e-3)
    np.testing.assert_allclose(back3d[0].dims, boxes[0].dims,
                               atol=1e-3)
    assert abs(back3d[0].yaw - 0.3) < 1e-3

    disp = np.abs(np.random.default_rng(1).normal(
        8.0, 2.0, (16, 24))).astype(np.float32)
    dpath = str(tmp_path / "d.png")
    perception.write_disparity_png(dpath, disp)
    backd = perception.read_disparity_png(dpath)
    np.testing.assert_allclose(backd, disp, atol=1.0 / 256)


def test_precompute_cli_end_to_end(tmp_path):
    """Online nets -> reference-format artifacts -> offline readers."""
    from dynamic_vins_tpu.io import perception
    from dynamic_vins_tpu.tools import precompute

    left, right = _fake_image_dir(tmp_path)
    out = str(tmp_path / "artifacts")
    precompute.main(["--left", left, "--right", right, "--out", out,
                     "--tasks", "seg,det3d,disp", "--max-frames", "2"])
    # every artifact is loadable through the reference-format readers
    for i in range(2):
        name = f"{i:06d}"
        seg = perception.read_solo_seg_pt(
            os.path.join(out, "seg"), name, score_threshold=0.0)
        # untrained/synthetic nets may detect nothing; the files must
        # still exist and parse
        assert os.path.exists(os.path.join(
            out, "seg", f"cate_score_{name}.pt"))
        assert seg is None or seg.masks.ndim == 3
        assert os.path.exists(os.path.join(out, "det3d", name + ".txt"))
        perception.read_fcos3d_txt(
            os.path.join(out, "det3d", name + ".txt"))
        d = perception.read_disparity_png(
            os.path.join(out, "disp", name + ".png"))
        assert d is not None and d.shape == (64, 96) and \
            np.isfinite(d).all()


def test_engine_export_roundtrip(tmp_path):
    """jax.export artifact calls identically to the live jit."""
    import jax.numpy as jnp

    from dynamic_vins_tpu.tools import build_engines

    fn, params, inputs = build_engines.stage_fn("reid", None)
    path = build_engines.export_stage("reid", None, str(tmp_path))
    assert os.path.getsize(path) > 0
    engine = build_engines.load_engine(path)
    x = jnp.asarray(np.random.default_rng(0).normal(
        0, 1, inputs[0].shape).astype(np.float32))
    live = np.asarray(fn(params, x))
    aot = np.asarray(engine(params, x))
    np.testing.assert_allclose(aot, live, atol=1e-5)


def test_shipped_weights_manifest():
    """Every manifest entry resolves to a file and loads into its
    online wrapper (skips when no weights are shipped yet)."""
    from dynamic_vins_tpu.models import pretrained

    man = pretrained.manifest()
    if not man:
        pytest.skip("no shipped weights")
    for task in man:
        assert pretrained.weights_path(task), f"{task} file missing"
    if "reid" in man:
        wrap = pretrained.load_online("reid", None)
        emb = wrap(np.random.default_rng(0).uniform(
            0, 255, (48, 48)).astype(np.float32),
            np.array([[4, 4, 40, 40]]))
        assert emb.shape[0] == 1 and np.isfinite(emb).all()
