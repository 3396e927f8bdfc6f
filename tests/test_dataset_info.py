"""Dataset metadata loaders and per-subject splits."""

import numpy as np

from ugaitnet_tpu.data.dataset_info import (
    TumGaidMetadata, load_groups_file, split_train_val_by_subject)


def test_split_by_subject_every_class_in_both():
    labels = np.repeat(np.arange(5), 10)
    tr, val = split_train_val_by_subject(labels, perc=0.2)
    assert len(tr) + len(val) == 50
    assert set(labels[tr]) == set(range(5))
    assert set(labels[val]) == set(range(5))
    # 20% of 50 = 10 -> 2 per subject
    for lab in range(5):
        assert (labels[val] == lab).sum() == 2


def test_groups_file(tmp_path):
    p = tmp_path / "groups.txt"
    p.write_text("1 10 11 12\n2 20 21\n")
    g = load_groups_file(str(p))
    assert g == {1: [10, 11, 12], 2: [20, 21]}


def test_tum_metadata(tmp_path):
    (tmp_path / "tumgaidtrainids.lst").write_text("1 2 3\n")
    (tmp_path / "tumgaidvalids.lst").write_text("4\n")
    (tmp_path / "tumgaidtestids.lst").write_text("5 6\n")
    (tmp_path / "allgender.txt").write_text("m f m f m f\n")
    db = TumGaidMetadata(str(tmp_path))
    assert db.train == [1, 2, 3]
    assert db.gender(1) == "f"
    labels = np.array([1, 4, 5, 2, 6])
    tr, val, te = db.split_indices(labels)
    np.testing.assert_array_equal(tr, [0, 3])
    np.testing.assert_array_equal(val, [1])
    np.testing.assert_array_equal(te, [2, 4])
