"""The shipped synthetic-trained checkpoints must beat untrained
models by a wide margin on FRESH batches from their training
distributions (training/data.py), proving the full train -> save(f16)
-> load -> online-inference loop.

Thresholds sit ~2-4x above the observed trained metrics (see
weights/MANIFEST.json "trained") and far below untrained ones, so they
are robust to retraining noise.
"""

import numpy as np
import pytest

from dynamic_vins_tpu.models import pretrained

pytestmark = pytest.mark.skipif(
    not pretrained.manifest(), reason="no shipped weights")


def _task(name, batch=2, seed=123):
    """(params_trained, loss_fn, fresh batch) via the training CLI's
    own task builder — guarantees architecture match."""
    from dynamic_vins_tpu.models.solov2 import load_params
    from dynamic_vins_tpu.training import cli

    rng = np.random.default_rng(seed)
    params0, loss_fn, gen = cli.build_task(name, (96, 128), rng, batch)
    path = pretrained.weights_path(name)
    assert path, f"{name} missing from weights/"
    return params0, load_params(params0, path), loss_fn, gen()


def _losses(name, **kw):
    p0, pt, loss_fn, batch = _task(name, **kw)
    l0 = float(loss_fn(p0, batch)[0])
    lt = float(loss_fn(pt, batch)[0])
    return l0, lt


def test_stereo_weights():
    l0, lt = _losses("stereo")
    assert lt < 2.5, f"trained stereo EPE {lt:.2f} px"
    assert lt < 0.5 * l0


def test_flow_weights():
    l0, lt = _losses("flow", batch=1)
    assert lt < 9.0, f"trained flow EPE {lt:.2f} px"
    assert lt < 0.6 * l0


def test_solo_weights():
    l0, lt = _losses("solo")
    assert lt < 1.6, f"trained solo loss {lt:.2f}"
    assert lt < 0.6 * l0


def test_det3d_weights():
    l0, lt = _losses("det3d")
    assert lt < 4.0, f"trained det3d loss {lt:.2f}"
    assert lt < 0.7 * l0


def test_reid_weights_separate_identities():
    """Embeddings must cluster by identity on fresh crops."""
    from dynamic_vins_tpu.training import data as tdata

    p0, pt, loss_fn, _ = _task("reid")
    rng = np.random.default_rng(7)
    im, lab = tdata.reid_batch(rng, num_ids=4, views=4, hw=(64, 32))
    import jax.numpy as jnp

    from dynamic_vins_tpu.models.reid import ReidNet

    emb = np.asarray(ReidNet().apply(
        pt, (jnp.asarray(im) / 255.0 - 0.45) / 0.225))
    lab = np.asarray(lab)
    sim = emb @ emb.T
    same = lab[:, None] == lab[None, :]
    off = ~np.eye(len(lab), dtype=bool)
    intra = sim[same & off].mean()
    inter = sim[~same].mean()
    assert intra - inter > 0.25, (intra, inter)
