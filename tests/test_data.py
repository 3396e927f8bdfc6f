"""Data layer: sampler balance, split, synthetic source, device pipeline."""

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core.config import DataConfig
from ugaitnet_tpu.data.pipeline import GaitPipeline, gather_host_batch
from ugaitnet_tpu.data.sampler import (
    BalancedGaitSampler, SequentialSampler, split_train_val_by_video)
from ugaitnet_tpu.data.schema import GaitDataset
from ugaitnet_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def ds():
    return make_synthetic_dataset(num_subjects=6, videos_per_subject=3,
                                  subseqs_per_video=4, seed=0)


def test_synthetic_shapes(ds):
    assert len(ds) == 6 * 3 * 4
    assert ds.modalities["of"].volumes.shape[1:] == (50, 60, 60)
    assert ds.modalities["of"].volumes.dtype == np.int16
    assert ds.modalities["gray"].volumes.shape[1:] == (25, 60, 60)
    assert ds.modalities["gray"].volumes.dtype == np.uint8
    assert set(ds.label_map().values()) == set(range(6))


def test_dataset_roundtrip(tmp_path, ds):
    ds.save(str(tmp_path / "d"))
    back = GaitDataset.load(str(tmp_path / "d"))
    np.testing.assert_array_equal(back.labels, ds.labels)
    np.testing.assert_array_equal(back.modalities["of"].volumes,
                                  ds.modalities["of"].volumes)
    assert back.modalities["of"].compress_factor == 100.0


def test_sampler_pk_structure(ds):
    s = BalancedGaitSampler(ds.labels, ds.gaits, batch_size=20,
                            repetition=5, seed=1)
    batch = s.next_batch()
    assert len(batch) == 20
    labs = ds.labels[batch]
    # repetition=5 -> 10 records per subject before advancing: 2 subjects
    uniq, counts = np.unique(labs, return_counts=True)
    assert len(uniq) == 2
    np.testing.assert_array_equal(counts, [10, 10])
    # gait-balanced within each subject's block
    for u in uniq:
        g, gc = np.unique(ds.gaits[batch[labs == u]], return_counts=True)
        assert len(g) == 3


def test_sampler_epoch_reshuffles(ds):
    s = BalancedGaitSampler(ds.labels, ds.gaits, batch_size=20,
                            repetition=5, seed=2)
    first = [b.copy() for b in s.epoch()]
    second = [b.copy() for b in s.epoch()]
    assert len(first) == len(s)
    assert any(not np.array_equal(a, b) for a, b in zip(first, second))


def test_split_by_video_keeps_videos_whole(ds):
    tr, val = split_train_val_by_video(ds.video_ids, perc=0.2, seed=0)
    assert len(tr) + len(val) == len(ds)
    assert len(val) > 0
    assert not set(ds.video_ids[tr]) & set(ds.video_ids[val])


def test_sequential_sampler_covers_all(ds):
    s = SequentialSampler(len(ds), 16)
    seen = np.concatenate(list(s.epoch()))
    np.testing.assert_array_equal(seen, np.arange(len(ds)))


def test_pipeline_shapes_and_flags(ds):
    cfg = DataConfig(batch_size=8, expand_level=3)
    pipe = GaitPipeline(ds, cfg, ("of", "gray"), labmap=ds.label_map())
    vols, flags, labels = pipe.load(np.arange(8), jax.random.PRNGKey(0))
    assert vols[0].shape == (24, 25, 60, 60, 2)
    assert vols[1].shape == (24, 25, 60, 60, 1)
    assert flags[0].shape == (24,)
    assert labels.shape == (24,)
    f = np.stack([np.asarray(flags[0]), np.asarray(flags[1])], axis=1)
    f = f.reshape(8, 3, 2)
    # copy 0: both modalities on; copies 1,2: exactly one on, complementary
    np.testing.assert_array_equal(f[:, 0], 1.0)
    np.testing.assert_array_equal(f[:, 1].sum(1), 1.0)
    np.testing.assert_array_equal(f[:, 2].sum(1), 1.0)
    np.testing.assert_array_equal(f[:, 1] + f[:, 2], 1.0)
    # labels replicated across expand copies
    labs = np.asarray(labels).reshape(8, 3)
    assert (labs == labs[:, :1]).all()


def test_pipeline_disabled_modality_is_noise(ds):
    cfg = DataConfig(batch_size=4, expand_level=2, augment=False)
    pipe = GaitPipeline(ds, cfg, ("of", "gray"), augment=False)
    vols, flags, _ = pipe.load(np.arange(4), jax.random.PRNGKey(1))
    for mi in range(2):
        v = np.asarray(vols[mi])
        u = np.asarray(flags[mi])
        for row in range(v.shape[0]):
            if u[row] == 0:
                np.testing.assert_allclose(v[row], 1e-9)


def test_pipeline_normalization_ranges(ds):
    cfg = DataConfig(batch_size=4, expand_level=1, augment=False)
    pipe = GaitPipeline(ds, cfg, ("of", "gray"), augment=False)
    vols, _, _ = pipe.load(np.arange(4), jax.random.PRNGKey(2))
    of = np.asarray(vols[0])
    gray = np.asarray(vols[1])
    # OF: int16/100 * 0.1 (ntype=2)
    raw = ds.modalities["of"].volumes[:4].astype(np.float32) / 1000.0
    got = np.moveaxis(of.reshape(4, 25, 60, 60, 2), -1, 2).reshape(4, 50, 60, 60)
    np.testing.assert_allclose(got, raw, atol=1e-6)
    # gray: /255 - 0.5
    assert gray.min() >= -0.5 - 1e-6 and gray.max() <= 0.5 + 1e-6


def test_pipeline_augmentation_changes_data_but_not_labels(ds):
    cfg = DataConfig(batch_size=4, expand_level=1, augment=True)
    pipe = GaitPipeline(ds, cfg, ("of", "gray"))
    v1, _, l1 = pipe.load(np.arange(4), jax.random.PRNGKey(3))
    v2, _, l2 = pipe.load(np.arange(4), jax.random.PRNGKey(4))
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
    assert not np.allclose(np.asarray(v1[0]), np.asarray(v2[0]))


def test_augmentation_probabilities_match_reference(ds):
    """Call-site probability parity (...single.py:401-417): ~3/4 of samples
    get a transform, ~1/2 of those also flip."""
    import jax
    from ugaitnet_tpu.ops.augment import random_transform_params
    p = random_transform_params(jax.random.PRNGKey(0), 4000)
    apply_rate = float(np.asarray(p.apply, np.float32).mean())
    flip_rate = float(np.asarray(p.flip, np.float32).mean())
    clip_rate = float(np.asarray(p.clip_of, np.float32).mean())
    assert abs(apply_rate - 0.75) < 0.03
    assert abs(flip_rate - 0.375) < 0.03   # flip only when apply: 0.75*0.5
    assert abs(clip_rate - 0.5) < 0.03
    # shift values come from the reference displace set
    assert set(np.unique(np.asarray(p.tx))) <= {-5.0, -3.0, 0.0, 3.0, 5.0}
    z = np.asarray(p.zx)
    assert z.min() >= 0.96 - 1e-6 and z.max() <= 1.04 + 1e-6


def test_three_mod_dropout_distribution():
    """3-mod expand=2 even rows: disable count uniform in {1, nmods-1}
    (with-replacement picks), never all modalities (__gen_batchMM :783-807)."""
    from ugaitnet_tpu.data.pipeline import _dropout_masks
    m = np.asarray(_dropout_masks(jax.random.PRNGKey(0), 2000, 3, 2))
    copy1 = m[:, 1, :]
    even = np.arange(2000) % 2 == 0
    # never everything disabled, never everything kept on the dropout copy
    assert copy1.sum(1).min() >= 1
    assert (copy1[even].sum(1) <= 2).all()
    # odd rows: exactly one modality kept, cycling
    assert (copy1[~even].sum(1) == 1).all()
    # even rows: both 1-kept and 2-kept cases occur with real mass
    kept = copy1[even].sum(1)
    frac_two_kept = (kept == 2).mean()
    assert 0.45 < frac_two_kept < 0.88  # ref: P(1 disabled) = 2/3


def test_preprocess_helpers_match_pipeline():
    """Drift guard: ops/preprocess's per-volume helpers must produce the
    same numbers as the fused data/pipeline.preprocess_batch on the
    non-augmented path (both re-derive __load_dd)."""
    import jax
    import jax.numpy as jnp

    from ugaitnet_tpu.core.config import DataConfig
    from ugaitnet_tpu.data.pipeline import preprocess_batch
    from ugaitnet_tpu.ops.preprocess import normalize_volume, planes_to_frames

    rng = np.random.RandomState(3)
    B = 4
    raw = {
        "raw_of": jnp.asarray(
            rng.randint(-3000, 3000, (B, 50, 60, 60)).astype(np.int16)),
        "raw_gray": jnp.asarray(
            rng.randint(0, 255, (B, 25, 60, 60)).astype(np.uint8)),
        "present_of": jnp.ones((B,), jnp.float32),
        "present_gray": jnp.ones((B,), jnp.float32),
        "labels": jnp.zeros((B,), jnp.int32),
    }
    vols, flags, _ = preprocess_batch(
        raw, jax.random.PRNGKey(0), ("of", "gray"), (2, 1), (100.0, 1.0),
        2, 1, False, DataConfig(augment=False))
    want_of = planes_to_frames(
        normalize_volume(raw["raw_of"], "of", ntype=2, compress_factor=100.0),
        2)
    want_gray = planes_to_frames(
        normalize_volume(raw["raw_gray"], "gray"), 1)
    # atol: values crossing 0 (x/255 - 0.5) make pure rtol meaningless
    np.testing.assert_allclose(np.asarray(vols[0]), np.asarray(want_of),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(vols[1]), np.asarray(want_gray),
                               rtol=1e-6, atol=1e-7)


def test_mirror_even_plane_quirk_matches_interleaved_stack():
    """negate_even_frames=True must negate exactly the even indices of the
    reference's interleaved (H, W, T*C) plane stack (mj_augmentation.py:
    29-30) for every channel count — C=3 alternates with (t+c) parity."""
    from ugaitnet_tpu.ops.augment import mirror_volume
    rng = np.random.RandomState(0)
    for c in (1, 2, 3):
        x = rng.randn(4, 6, 6, c).astype(np.float32)
        got = np.asarray(mirror_volume(x, is_of=False,
                                       negate_even_frames=True))
        # literal reference behavior on the interleaved stack
        stack = np.moveaxis(np.flip(x, axis=2), 0, 2)     # (H, W, T, C)
        stack = stack.reshape(6, 6, 4 * c)                # (H, W, T*C)
        stack[:, :, ::2] *= -1.0
        want = np.moveaxis(stack.reshape(6, 6, 4, c), 2, 0)
        np.testing.assert_allclose(got, want, rtol=1e-6)
