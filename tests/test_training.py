"""Training infrastructure: losses, synthetic labeled data, sharded
train steps, checkpoints (beyond-reference capability — the reference
ships only frozen inference artifacts, SURVEY.md §2 L2)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dynamic_vins_tpu.training import (Trainer, TrainConfig,
                                       data_parallel_mesh)
from dynamic_vins_tpu.training import data as tdata
from dynamic_vins_tpu.training import losses


def _norm(img):
    return (jnp.asarray(img) / 255.0 - 0.45) / 0.225


# ---------------------------------------------------------------------------
# stereo
# ---------------------------------------------------------------------------
def _stereo_setup(hw=(48, 64), max_disp=16, batch=2, seed=0):
    from dynamic_vins_tpu.models.stereo_net import StereoNet

    model = StereoNet(max_disp=max_disp)
    rng = np.random.default_rng(seed)
    batch_data = tdata.stereo_batch(rng, batch, hw, max_disp)
    params = model.init(jax.random.PRNGKey(0),
                        _norm(batch_data[0]), _norm(batch_data[1]))

    def loss_fn(p, b):
        left, right, disp, valid = b
        pred = model.apply(p, _norm(left), _norm(right))
        l = losses.stereo_loss(pred, disp, valid)
        return l, {"epe": l}

    return model, params, loss_fn, batch_data


def test_stereo_training_overfits():
    model, params, loss_fn, batch = _stereo_setup()
    tr = Trainer(loss_fn, params, TrainConfig(learning_rate=2e-3,
                                              total_steps=60))
    first, _ = tr.step(batch)
    for _ in range(39):
        last, _ = tr.step(batch)
    assert np.isfinite(last)
    assert last < 0.5 * first, f"stereo loss {first} -> {last}"


def test_data_parallel_step_matches_single_device():
    n = min(8, jax.device_count())
    if n < 2:
        pytest.skip("needs multiple devices")
    model, params, loss_fn, batch = _stereo_setup(batch=n)
    tr_s = Trainer(loss_fn, params, TrainConfig())
    tr_m = Trainer(loss_fn, params, TrainConfig(),
                   mesh=data_parallel_mesh(n))
    for _ in range(3):
        l_s, _ = tr_s.step(batch)
        l_m, _ = tr_m.step(batch)
    assert np.isclose(l_s, l_m, rtol=1e-4), (l_s, l_m)
    ps = jax.tree.leaves(tr_s.params)
    pm = jax.tree.leaves(tr_m.params)
    # f32 cross-shard reduction order differs from single-device; Adam
    # amplifies that on near-zero params — tolerance reflects 3 steps
    # at lr=1e-3
    for a, b in zip(ps, pm):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-5)


def test_checkpoint_roundtrip(tmp_path):
    model, params, loss_fn, batch = _stereo_setup()
    tr = Trainer(loss_fn, params, TrainConfig())
    tr.step(batch)
    path = os.path.join(tmp_path, "ckpt.npz")
    tr.save(path)
    tr2 = Trainer(loss_fn, params, TrainConfig())
    tr2.load(path)
    for a, b in zip(jax.tree.leaves(tr.params),
                    jax.tree.leaves(tr2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# optical flow
# ---------------------------------------------------------------------------
def test_flow_training_improves_epe():
    from dynamic_vins_tpu.models.raft import RAFT

    model = RAFT(iters=3)
    rng = np.random.default_rng(1)
    batch = tdata.flow_batch(rng, 2, hw=(48, 64), max_flow=3.0)
    params = model.init(jax.random.PRNGKey(0),
                        _norm(batch[0][:1]), _norm(batch[1][:1]))

    def loss_fn(p, b):
        img1, img2, flow, valid = b
        pred = jax.vmap(lambda a, c: model.apply(p, a[None], c[None]))(
            _norm(img1), _norm(img2))
        l = losses.flow_loss(pred, flow, valid)
        return l, {"epe": l}

    tr = Trainer(loss_fn, params, TrainConfig(learning_rate=1e-3,
                                              total_steps=40))
    first, _ = tr.step(batch)
    for _ in range(24):
        last, _ = tr.step(batch)
    assert np.isfinite(last)
    assert last < 0.8 * first, f"flow epe {first} -> {last}"


# ---------------------------------------------------------------------------
# SOLOv2
# ---------------------------------------------------------------------------
def test_solo_targets_assignment():
    # one centered square instance -> positive cells at its center in
    # the level matching its scale, background elsewhere
    H = W = 96
    m = np.zeros((1, H, W), bool)
    m[0, 36:60, 36:60] = True
    cate, idx = losses.solo_targets(m, np.array([3]), np.array([True]),
                                    grid_sizes=(12, 8, 6, 4),
                                    num_classes=8)
    assert (cate != 8).sum() > 0, "no positive cells"
    assert set(np.unique(cate)) <= {3, 8}
    assert (idx[cate == 3] == 0).all()
    assert (idx[cate == 8] == -1).all()


def test_solo_training_decreases_loss():
    from dynamic_vins_tpu.models.solov2 import Solov2

    grids = (12, 8, 6, 4)
    model = Solov2(num_classes=8, grid_sizes=grids)
    rng = np.random.default_rng(2)
    imgs, cate_t, inst_t, masks_low = tdata.seg_batch(
        rng, 2, hw=(96, 128), num_classes=8, grid_sizes=grids,
        mask_hw=(24, 32))
    params = model.init(jax.random.PRNGKey(0), _norm(imgs))

    def loss_fn(p, b):
        im, ct, it, ml = b
        kernels, scores, mask_feat = model.apply(p, _norm(im))
        l, aux = losses.solo_loss(kernels, scores, mask_feat, ct, it,
                                  ml, num_classes=8)
        return l, {"cate": aux[0], "mask": aux[1]}

    batch = (imgs, cate_t, inst_t, masks_low)
    tr = Trainer(loss_fn, params, TrainConfig(learning_rate=1e-3,
                                              total_steps=40))
    first, _ = tr.step(batch)
    for _ in range(19):
        last, aux = tr.step(batch)
    assert np.isfinite(last)
    assert last < 0.7 * first, f"solo loss {first} -> {last}"


# ---------------------------------------------------------------------------
# FCOS3D
# ---------------------------------------------------------------------------
def test_det3d_training_decreases_loss():
    from dynamic_vins_tpu.models.det3d import FCOS3D

    model = FCOS3D(num_classes=6)
    rng = np.random.default_rng(3)
    imgs, tgts = tdata.det3d_batch(rng, 2, hw=(96, 128), num_classes=6)
    params = model.init(jax.random.PRNGKey(0), _norm(imgs))

    def loss_fn(p, b):
        im, t = b
        outs = model.apply(p, _norm(im))
        l, aux = losses.fcos3d_loss(outs, t, num_classes=6)
        return l, {"cls": aux[0], "ctr": aux[1], "reg": aux[2]}

    tr = Trainer(loss_fn, params, TrainConfig(learning_rate=1e-3,
                                              total_steps=40))
    first, _ = tr.step((imgs, tgts))
    for _ in range(19):
        last, _ = tr.step((imgs, tgts))
    assert np.isfinite(last)
    assert last < 0.7 * first, f"det3d loss {first} -> {last}"


# ---------------------------------------------------------------------------
# ReID
# ---------------------------------------------------------------------------
def test_reid_training_separates_identities():
    from dynamic_vins_tpu.models.reid import ReidNet

    model = ReidNet(embed_dim=32)
    rng = np.random.default_rng(4)
    imgs, ids = tdata.reid_batch(rng, num_ids=4, views=4, hw=(32, 16))
    params = model.init(jax.random.PRNGKey(0), _norm(imgs))

    def loss_fn(p, b):
        im, lab = b
        emb = model.apply(p, _norm(im))
        l = losses.triplet_loss(emb, lab)
        return l, {"trip": l}

    tr = Trainer(loss_fn, params, TrainConfig(learning_rate=1e-3,
                                              total_steps=60))
    tr.step((imgs, ids))
    for _ in range(39):
        last, _ = tr.step((imgs, ids))
    emb = np.asarray(model.apply(tr.params, _norm(imgs)))
    d = 1.0 - emb @ emb.T
    same = ids[:, None] == ids[None, :]
    eye = np.eye(len(ids), dtype=bool)
    intra = d[same & ~eye].mean()
    inter = d[~same].mean()
    assert np.isfinite(last)
    assert inter > intra + 0.1, f"intra {intra} inter {inter}"
