"""Model construction / shape / behavior tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
from ugaitnet_tpu.models.branches import Conv2DBranch, Conv3DBranch
from ugaitnet_tpu.models.gaitset import GaitSetBranch
from ugaitnet_tpu.models.network import UGaitNet, init_params


def test_conv2d_branch_shapes():
    m = Conv2DBranch(ndense_units=512)
    x = jnp.zeros((2, 60, 60, 50))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 512)


def test_conv3d_branch_shapes():
    m = Conv3DBranch(ndense_units=512)
    x = jnp.zeros((2, 25, 60, 60, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 512)


def test_gaitset_branch_shapes_and_param_count():
    m = GaitSetBranch()
    x = jnp.zeros((2, 25, 60, 60, 1))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    # 2 streams x (1+2+4+8+16)=31 bins -> 62 parts of 256 dims
    assert out.shape == (2, 62, 256)
    proj = params["params"]["part_proj"]
    assert proj.shape == (62, 128, 256)


def test_gaitset_of_two_channels():
    m = GaitSetBranch()
    x = jnp.zeros((2, 25, 60, 60, 2))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 62, 256)


def _flagship_cfg(**kw):
    return ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="sign_max", nclasses=74, **kw)


def test_flagship_forward_outputs():
    cfg = _flagship_cfg()
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    vols = [jnp.ones((2, 25, 60, 60, 2)) * 0.1,
            jnp.ones((2, 25, 60, 60, 1)) * 0.1]
    flags = [jnp.ones((2,)), jnp.ones((2,))]
    out = model.apply(params, vols, flags)
    assert out["signature"].shape == (2, 62, 256)
    assert out["flatten"].shape == (2, 62 * 256)
    assert out["classprob"].shape == (2, 74)
    np.testing.assert_allclose(np.asarray(out["classprob"]).sum(1), 1.0,
                               rtol=1e-5)


def test_missing_modality_gates_branch_out():
    cfg = _flagship_cfg()
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    rng = np.random.RandomState(0)
    of = jnp.asarray(rng.randn(2, 25, 60, 60, 2).astype(np.float32))
    gray = jnp.asarray(rng.randn(2, 25, 60, 60, 1).astype(np.float32))
    noise = jnp.full((2, 25, 60, 60, 2), 1e-9)

    # disabling OF must give identical signatures to feeding noise OF
    out1 = model.apply(params, [of, gray],
                       [jnp.zeros((2,)), jnp.ones((2,))])
    out2 = model.apply(params, [noise, gray],
                       [jnp.zeros((2,)), jnp.ones((2,))])
    np.testing.assert_allclose(np.asarray(out1["signature"]),
                               np.asarray(out2["signature"]), atol=1e-5)
    gated_of = np.asarray(out1["branches"][0])
    np.testing.assert_allclose(gated_of, 0.0)


def test_three_modality_model():
    cfg = ModelConfig(branches=(BranchConfig(kind="conv2d", modality="of"),
                                BranchConfig(kind="conv2d", modality="gray"),
                                BranchConfig(kind="conv2d", modality="depth")),
                      merge="max", nclasses=150, aux_losses=True)
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    vols = [jnp.zeros((2, 25, 60, 60, 2)), jnp.zeros((2, 25, 60, 60, 1)),
            jnp.zeros((2, 25, 60, 60, 1))]
    out = model.apply(params, vols)
    assert out["signature"].shape == (2, 512)
    assert len(out["aux_logits"]) == 3
    assert out["aux_logits"][0].shape == (2, 150)


def test_single_modality_model():
    cfg = ModelConfig(branches=(BranchConfig(kind="gaitset", modality="gray"),),
                      nclasses=155)
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    out = model.apply(params, [jnp.zeros((2, 25, 60, 60, 1))])
    assert out["signature"].shape == (2, 62, 256)
    assert out["classprob"].shape == (2, 155)


def test_extra_dense_code_tap():
    cfg = _flagship_cfg(extra_dense=(256,))
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    vols = [jnp.zeros((2, 25, 60, 60, 2)), jnp.zeros((2, 25, 60, 60, 1))]
    out = model.apply(params, vols)
    assert out["code"].shape == (2, 62, 256)


def test_dropout_only_active_in_train_mode():
    cfg = ModelConfig(branches=(BranchConfig(kind="conv2d", modality="gray"),),
                      nclasses=0)
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    x = [jnp.ones((2, 25, 60, 60, 1))]
    a = model.apply(params, x, train=False)
    b = model.apply(params, x, train=False)
    np.testing.assert_allclose(np.asarray(a["signature"]),
                               np.asarray(b["signature"]))
    c = model.apply(params, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    d = model.apply(params, x, train=True,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(c["signature"]),
                           np.asarray(d["signature"]))


def test_single_modality_signature_not_normalized():
    """Reference quirk: 1-mod nets emit the raw branch output as signature,
    no L2 (nets/mj_uwyhNets_ba.py:890-907)."""
    cfg = ModelConfig(branches=(BranchConfig(kind="conv2d", modality="gray",
                                             filters_numbers=(4, 4, 8, 8),
                                             ndense_units=16),),
                      nclasses=0)
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 25, 60, 60, 1)
                    .astype(np.float32))
    out = model.apply(params, [x])
    norms = np.linalg.norm(np.asarray(out["signature"]), axis=-1)
    assert not np.allclose(norms, 1.0, atol=1e-3)


def test_gaitset_flatten_output_variant():
    """BothDatasets gaitset branch: per-sample flattened + L2-normalized
    rank-2 embedding (mj_uwyhNets_bothDatasets.py:395-399)."""
    cfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8,
                               flatten_output=True),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8,
                               flatten_output=True)),
        merge="max", nclasses=5)
    model = UGaitNet(cfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    vols = [jnp.ones((2, 25, 60, 60, 2)) * 0.1,
            jnp.ones((2, 25, 60, 60, 1)) * 0.1]
    out = model.apply(params, vols)
    assert out["branches"][0].ndim == 2
    assert out["branches"][0].shape == (2, 62 * 8)
    assert out["signature"].shape == (2, 62 * 8)
    # rank-2 branch embeddings are L2-normalized per sample
    n = np.linalg.norm(np.asarray(out["branches"][0]), axis=-1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-5)
    assert out["classprob"].shape == (2, 5)
