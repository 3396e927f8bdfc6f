"""Checkpoint: save/restore exactness, latest-step scan, surgery restore."""

import numpy as np
import jax
import jax.numpy as jnp

from ugaitnet_tpu.core import checkpoint as ckpt
from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet, init_params
from ugaitnet_tpu.train.train_step import init_state, make_optimizer


def _mcfg(nclasses):
    return ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8),),
        nclasses=nclasses)


def test_save_restore_exact(tmp_path):
    model = UGaitNet(_mcfg(4))
    tx = make_optimizer(TrainConfig())
    state = init_state(model, tx, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path), 3, state)
    assert ckpt.latest_checkpoint_step(str(tmp_path)) == 3
    assert ckpt.latest_checkpoint_step(str(tmp_path), epoch_max=2) is None
    blank = init_state(model, tx, jax.random.PRNGKey(99))
    restored = ckpt.restore_checkpoint(str(tmp_path), 3, blank)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_surgery_restore_different_head(tmp_path):
    """Parity with load_weights(by_name=True, skip_mismatch=True): change
    nclasses, keep every compatible weight (nets/mj_uwyhNets_ba.py:610-630)."""
    model4 = UGaitNet(_mcfg(4))
    params4 = init_params(model4, jax.random.PRNGKey(0))
    ckpt.save_checkpoint(str(tmp_path), 1, params4)

    model9 = UGaitNet(_mcfg(9))
    params9 = init_params(model9, jax.random.PRNGKey(1))
    merged = ckpt.restore_params_surgery(str(tmp_path), 1, params9)

    # branch weights come from the checkpoint
    a = merged["params"]["branch_gray"]["a_conv1"]["kernel"]
    b = params4["params"]["branch_gray"]["a_conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # classifier head keeps the new shape/values
    assert merged["params"]["classprob"]["kernel"].shape[1] == 9
    np.testing.assert_array_equal(
        np.asarray(merged["params"]["classprob"]["kernel"]),
        np.asarray(params9["params"]["classprob"]["kernel"]))
