"""Serving: device-resident gallery identification end-to-end."""

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
from ugaitnet_tpu.eval.serving import SignatureService
from ugaitnet_tpu.models.network import UGaitNet, init_params


@pytest.fixture(scope="module")
def service():
    ds = make_synthetic_dataset(num_subjects=5, videos_per_subject=2,
                                subseqs_per_video=3, seed=7)
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="sign_max", nclasses=0)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    svc = SignatureService(model, params, ("of", "gray"), knn=3,
                           buckets=(4, 16))
    svc.build_gallery(ds, batch_size=16)
    return ds, svc


def test_identify_self_queries(service):
    ds, svc = service
    # querying gallery members must return their own labels (untrained net,
    # nearest neighbor = the identical sample at distance ~0)
    raw = {"raw_of": ds.modalities["of"].volumes[:6],
           "raw_gray": ds.modalities["gray"].volumes[:6]}
    labels, dists = svc.identify_raw(raw)
    np.testing.assert_array_equal(labels, ds.labels[:6])
    assert dists.shape == (6, 3)
    assert np.all(dists[:, 0] < dists[:, 2] + 1e-5)


def test_bucket_padding_consistency(service):
    ds, svc = service
    raw1 = {"raw_of": ds.modalities["of"].volumes[:1],
            "raw_gray": ds.modalities["gray"].volumes[:1]}
    raw3 = {"raw_of": ds.modalities["of"].volumes[:3],
            "raw_gray": ds.modalities["gray"].volumes[:3]}
    l1, d1 = svc.identify_raw(raw1)
    l3, d3 = svc.identify_raw(raw3)
    assert l1[0] == l3[0]
    np.testing.assert_allclose(d1[0], d3[0], rtol=1e-5)


def test_missing_modality_query(service):
    ds, svc = service
    raw = {"raw_of": np.zeros_like(ds.modalities["of"].volumes[:2]),
           "present_of": np.zeros(2, np.float32),
           "raw_gray": ds.modalities["gray"].volumes[:2]}
    labels, dists = svc.identify_raw(raw)
    assert labels.shape == (2,)
    assert np.isfinite(dists).all()


def test_warmup_precompiles_buckets(service):
    ds, svc = service
    svc.warmup()  # must not raise; compiles both buckets
    raw = {"raw_of": ds.modalities["of"].volumes[:2],
           "raw_gray": ds.modalities["gray"].volumes[:2]}
    labels, _ = svc.identify_raw(raw)
    assert labels.shape == (2,)
