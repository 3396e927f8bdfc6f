"""Branch/full warm start (reference --initnet + init_branches,
nets/mj_uwyhNets_ba.py:57-62,419-424,582-632,765)."""

import numpy as np
import jax
import pytest

from ugaitnet_tpu.core import checkpoint as ckpt
from ugaitnet_tpu.core.config import BranchConfig, ModelConfig, TrainConfig
from ugaitnet_tpu.models.network import UGaitNet, init_params
from ugaitnet_tpu.train.train_step import init_state, make_optimizer
from ugaitnet_tpu.utils.warm_start import (
    parse_initbranch_specs, warm_start_branches, warm_start_full)


def _gaitset_cfg(mods, nclasses=4):
    return ModelConfig(
        branches=tuple(BranchConfig(kind="gaitset", modality=m,
                                    gaitset_channels=(4, 4, 8), part_dim=8)
                       for m in mods),
        merge="sign_max" if len(mods) > 1 else "max", nclasses=nclasses)


@pytest.fixture(scope="module")
def single_mod_experiment(tmp_path_factory):
    """A 'trained' single-modality OF experiment (random but non-init
    weights via a distinct seed), checkpointed at epoch 1."""
    exp = str(tmp_path_factory.mktemp("of_single"))
    mcfg = _gaitset_cfg(("of",))
    model = UGaitNet(mcfg)
    tx = make_optimizer(TrainConfig())
    state = init_state(model, tx, jax.random.PRNGKey(42))
    ckpt.save_checkpoint(exp, 1, state)
    return exp, state


def test_branch_warm_start_from_prior_experiment(single_mod_experiment):
    """VERDICT round-1 done-criterion: train branch A single-mod, init a
    2-mod net from it, branch weights equal at step 0."""
    exp, src_state = single_mod_experiment
    mcfg2 = _gaitset_cfg(("of", "gray"))
    model2 = UGaitNet(mcfg2)
    params2 = init_params(model2, jax.random.PRNGKey(0))

    out = warm_start_branches(params2, {"of": (exp, "of")})
    src = src_state.params["params"]["branch_of"]
    dst = out["params"]["branch_of"]
    sflat = {str(k): v for k, v
             in jax.tree_util.tree_flatten_with_path(src)[0]}
    dflat = {str(k): v for k, v
             in jax.tree_util.tree_flatten_with_path(dst)[0]}
    assert set(sflat) == set(dflat)
    for k, a in sflat.items():
        np.testing.assert_allclose(np.asarray(a), np.asarray(dflat[k]),
                                   err_msg=k)
    # the other branch stays freshly initialized
    fresh = params2["params"]["branch_gray"]
    for a, b in zip(jax.tree.leaves(fresh),
                    jax.tree.leaves(out["params"]["branch_gray"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_gray_from_of_quirk_remap(single_mod_experiment):
    """The :765 quirk — gray branch initialized from the OF source — is the
    explicit src-modality remap."""
    exp, src_state = single_mod_experiment
    mcfg2 = _gaitset_cfg(("of", "gray"))
    params2 = init_params(UGaitNet(mcfg2), jax.random.PRNGKey(0))
    out = warm_start_branches(params2, {"gray": (exp, "of")})
    src = src_state.params["params"]["branch_of"]
    dst = out["params"]["branch_gray"]
    # shapes differ only at the first conv (input channels 2 vs 1): that
    # kernel keeps the fresh init, everything else copies
    copied = total = 0
    sflat = dict(jax.tree_util.tree_flatten_with_path(src)[0])
    dflat = dict(jax.tree_util.tree_flatten_with_path(dst)[0])
    for k, sv in sflat.items():
        dv = dflat[k]
        total += 1
        if np.asarray(sv).shape == np.asarray(dv).shape:
            np.testing.assert_allclose(np.asarray(sv), np.asarray(dv))
            copied += 1
    assert copied >= total - 1  # at most the in-channel conv differs


def test_full_warm_start_with_head_surgery(single_mod_experiment):
    """--initnet with a different nclasses: body copies, head stays fresh."""
    exp, src_state = single_mod_experiment
    mcfg = _gaitset_cfg(("of",), nclasses=9)  # source had 4
    params = init_params(UGaitNet(mcfg), jax.random.PRNGKey(0))
    out = warm_start_full(params, exp)
    np.testing.assert_allclose(
        np.asarray(out["params"]["branch_of"]["a_conv1"]["kernel"]),
        np.asarray(
            src_state.params["params"]["branch_of"]["a_conv1"]["kernel"]))
    # head kept fresh (shape mismatch 4 vs 9)
    np.testing.assert_allclose(
        np.asarray(out["params"]["classprob"]["kernel"]),
        np.asarray(params["params"]["classprob"]["kernel"]))


def test_parse_initbranch_specs():
    specs = parse_initbranch_specs(["gray=/x/y@of", "of=/a/b"],
                                   ("of", "gray"))
    assert specs == {"gray": ("/x/y", "of"), "of": ("/a/b", "of")}
    with pytest.raises(ValueError):
        parse_initbranch_specs(["depth=/x"], ("of", "gray"))


def test_trainer_warm_start_applies_once(single_mod_experiment, tmp_path):
    from ugaitnet_tpu.core.config import DataConfig
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.train.trainer import Trainer

    exp, src_state = single_mod_experiment
    ds = make_synthetic_dataset(num_subjects=4, videos_per_subject=2,
                                subseqs_per_video=2, seed=1)
    mcfg = _gaitset_cfg(("of", "gray"))
    dcfg = DataConfig(batch_size=4, expand_level=1, augment=False)
    tcfg = TrainConfig(lr=1e-4, epochs=0, extra_epochs=0,
                       save_every_epochs=1)
    t = Trainer(mcfg, dcfg, tcfg, str(tmp_path / "exp"),
                warm_start=lambda p: warm_start_branches(
                    p, {"of": (exp, "of")}))
    state, start = t.init_or_resume()
    assert start == 0
    np.testing.assert_allclose(
        np.asarray(state.params["params"]["branch_of"]["a_conv1"]["kernel"]),
        np.asarray(
            src_state.params["params"]["branch_of"]["a_conv1"]["kernel"]))
