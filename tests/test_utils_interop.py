"""net_utils (freeze/softlabel/filter export) + TFRecord interop reader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet, init_params
from ugaitnet_tpu.train.train_step import make_optimizer
from ugaitnet_tpu.utils.net_utils import (
    freeze_branches_predicate, freeze_convs_predicate, frozen_optimizer,
    save_filter_grid, save_sprite, soft_labels)


def test_soft_labels_matches_reference_formula():
    out = soft_labels([0, 2], nclasses=4, epsilon=0.1)
    the_class = 1.0 - 0.1 * 3 / 4
    np.testing.assert_allclose(out[0, 0], the_class)
    np.testing.assert_allclose(out[0, 1], 0.025)
    np.testing.assert_allclose(out[1, 2], the_class)


def test_frozen_optimizer_zeroes_conv_updates():
    mcfg = ModelConfig(branches=(BranchConfig(
        kind="gaitset", modality="gray", gaitset_channels=(4, 4, 8),
        part_dim=8),), nclasses=3)
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0))
    tx = frozen_optimizer(optax.sgd(0.1), params, freeze_convs_predicate)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    conv_up = updates["params"]["branch_gray"]["a_conv1"]["kernel"]
    head_up = updates["params"]["classprob"]["kernel"]
    np.testing.assert_allclose(np.asarray(conv_up), 0.0)
    assert np.abs(np.asarray(head_up)).max() > 0


def test_freeze_mask_insertion_order_independent():
    """Regression: labels must follow each leaf's own path even when dict
    insertion order differs from tree_flatten's sorted key order (the old
    zip-against-recursion approach froze the wrong subtree)."""
    from ugaitnet_tpu.utils.net_utils import freeze_mask
    # 'b_mod' inserted before 'a_mod': insertion order != sorted order.
    params = {"b_mod": {"z": jnp.ones(2)}, "a_mod": {"z": jnp.ones(2)}}
    labels = freeze_mask(params, lambda p: "b_mod" in p)
    assert labels["b_mod"]["z"] == "frozen"
    assert labels["a_mod"]["z"] == "trainable"


def test_freeze_branches_predicate():
    assert freeze_branches_predicate("params/branch_of/a_conv1/kernel")
    assert not freeze_branches_predicate("params/classprob/kernel")


def test_filter_grid_and_sprite_export(tmp_path):
    k = np.random.RandomState(0).randn(5, 5, 3, 16)
    p = save_filter_grid(k, str(tmp_path / "filters.png"))
    assert os.path.exists(p)
    imgs = [np.random.RandomState(i).rand(60, 60) for i in range(9)]
    p2 = save_sprite(imgs, str(tmp_path / "sprite.png"), max_size=512)
    assert os.path.exists(p2)


def test_tfrecord_reader_against_tensorflow(tmp_path):
    """Golden interop: write a gait record with TF, read with our TF-free
    parser (mj_tfdata format)."""
    tf = pytest.importorskip("tensorflow")
    from ugaitnet_tpu.data.tfrecord import load_gait_tfrecord

    rng = np.random.RandomState(0)
    vol = rng.randint(-3000, 3000, (1, 50, 60, 60)).astype(np.int16)

    def i64(v):
        return tf.train.Feature(int64_list=tf.train.Int64List(value=[v]))

    ex = tf.train.Example(features=tf.train.Features(feature={
        "height": i64(60), "width": i64(60), "depth": i64(50),
        "data": tf.train.Feature(bytes_list=tf.train.BytesList(
            value=[vol.tobytes()])),
        "labels": i64(42), "set": i64(1), "videoId": i64(7),
        "compressFactor": i64(100), "gait": i64(2),
    }))
    path = str(tmp_path / "sample.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())

    data, label, vid = load_gait_tfrecord(path)
    assert label == 42 and vid == 7
    np.testing.assert_allclose(data, vol.astype(np.float32) / 100.0)

    full = load_gait_tfrecord(path, all_info=True)
    assert full["gait"] == [2] and full["compressFactor"] == [100]


def test_xplane_summary_parses_empty(tmp_path):
    """obsv/profiling: missing trace raises cleanly; real parsing is
    exercised on hardware via benchmarks/parse_xplane.py."""
    import pytest

    from ugaitnet_tpu.obsv.profiling import summarize_xplane
    with pytest.raises(FileNotFoundError):
        summarize_xplane(str(tmp_path))


def test_tfrecord_negative_int64_and_data_crc(tmp_path):
    """Negative Int64List values are two's-complement 10-byte varints (the
    unsigned decode returned 2^64-1 for -1); payload crc verification is
    opt-in (python-loop cost) but must still catch corruption."""
    tf = pytest.importorskip("tensorflow")
    from ugaitnet_tpu.data.tfrecord import iter_tfrecords, parse_example

    ex = tf.train.Example(features=tf.train.Features(feature={
        "videoId": tf.train.Feature(
            int64_list=tf.train.Int64List(value=[-1, 3])),
    }))
    path = str(tmp_path / "neg.tfrecord")
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    payloads = list(iter_tfrecords(path, crc="full"))
    parsed = parse_example(payloads[0])
    assert parsed["videoId"] == [-1, 3]

    # corrupt one payload byte: the data crc must catch it when asked
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF
    bad = str(tmp_path / "bad.tfrecord")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="corrupt"):
        list(iter_tfrecords(bad, crc="full"))


def test_tfrecord_truncated_header_raises(tmp_path):
    """0 bytes left = clean EOF; 1-11 bytes left = a file cut mid-header
    (partial copy) and must raise like mid-payload truncation does, not
    silently shorten the dataset."""
    import struct
    from ugaitnet_tpu.data.tfrecord import _masked_crc, iter_tfrecords
    payload = b"hello-record"
    head = struct.pack("<Q", len(payload))
    rec = (head + struct.pack("<I", _masked_crc(head)) + payload
           + struct.pack("<I", _masked_crc(payload)))
    ok = tmp_path / "ok.tfrecord"
    ok.write_bytes(rec)
    assert list(iter_tfrecords(str(ok), crc="full")) == [payload]
    trunc = tmp_path / "trunc.tfrecord"
    trunc.write_bytes(rec + rec[:7])   # 7 bytes of a second record's header
    with pytest.raises(ValueError, match="length header cut"):
        list(iter_tfrecords(str(trunc), crc="none"))
