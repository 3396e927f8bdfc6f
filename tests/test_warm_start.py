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


def _write_fake_gaitset_h5(path, nbranch, ci_list, channels=(4, 4, 8),
                           part_dim=8, nclasses=None, seed=0):
    """Minimal h5 in the Keras weights layout for an nbranch gaitset net
    (layer groups named like the reference's build order)."""
    import h5py
    rng = np.random.RandomState(seed)
    c1, c2, c3 = channels
    with h5py.File(path, "w") as f:
        def layer(name, arrays):
            g = f.create_group(name)
            wnames = []
            for i, a in enumerate(arrays):
                wn = f"{name}/w_{i}:0"
                g.create_dataset(wn, data=a.astype(np.float32))
                wnames.append(wn.encode())
            g.attrs["weight_names"] = wnames
        idx_td = idx_c = idx_mm = 0
        for b in range(nbranch):
            ci = ci_list[b]
            shapes = [(5, 5, ci, c1), (3, 3, c1, c1), (3, 3, c1, c2),
                      (3, 3, c2, c2), (3, 3, c2, c3), (3, 3, c3, c3)]
            for s in shapes:
                name = ("time_distributed" if idx_td == 0
                        else f"time_distributed_{idx_td}")
                layer(name, [rng.randn(*s)])
                idx_td += 1
            for s in [(3, 3, c1, c2), (3, 3, c2, c2), (3, 3, c2, c3),
                      (3, 3, c3, c3)]:
                name = "conv2d" if idx_c == 0 else f"conv2d_{idx_c}"
                layer(name, [rng.randn(*s)])
                idx_c += 1
            name = "mat_mul" if idx_mm == 0 else f"mat_mul_{idx_mm}"
            layer(name, [rng.randn(62, c3, part_dim)])
            idx_mm += 1
        if nclasses:
            layer("classprob", [rng.randn(62 * part_dim, nclasses),
                                rng.randn(nclasses)])
        f.attrs["layer_names"] = [n.encode() for n in f.keys()]


def _tiny_2mod_params():
    import jax

    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
    from ugaitnet_tpu.models.network import UGaitNet, init_params
    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of",
                               gaitset_channels=(4, 4, 8), part_dim=8),
                  BranchConfig(kind="gaitset", modality="gray",
                               gaitset_channels=(4, 4, 8), part_dim=8)),
        merge="max", nclasses=7)
    model = UGaitNet(mcfg)
    return init_params(model, jax.random.PRNGKey(0))


def test_h5_branch_warm_start_does_not_clobber_others(tmp_path):
    """Regression: the Keras loaders used to mutate the caller's tree in
    place, so a single-branch h5 warm start silently overwrote EVERY
    branch and the classifier head."""
    from ugaitnet_tpu.utils.warm_start import warm_start_branches
    h5 = str(tmp_path / "src_weights.h5")
    _write_fake_gaitset_h5(h5, nbranch=2, ci_list=[2, 1], nclasses=7)
    params = _tiny_2mod_params()
    before_of = np.asarray(params["params"]["branch_of"]["a_conv1"]["kernel"])
    before_head = np.asarray(params["params"]["classprob"]["kernel"])
    out = warm_start_branches(params, {"gray": (h5, "gray")})
    # requested branch changed...
    assert not np.allclose(
        np.asarray(out["params"]["branch_gray"]["a_conv1"]["kernel"]),
        np.asarray(params["params"]["branch_gray"]["a_conv1"]["kernel"]))
    # ...the others did not (neither in the result nor the input tree)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["branch_of"]["a_conv1"]["kernel"]),
        before_of)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["branch_of"]["a_conv1"]["kernel"]),
        before_of)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["classprob"]["kernel"]), before_head)


def test_h5_branch_warm_start_from_single_mod_source(tmp_path):
    """The reference :765 quirk: a 2-mod net's gray branch initialized
    from a 1-mod OF model's only branch — source branch count differs
    from the target's."""
    from ugaitnet_tpu.utils.warm_start import warm_start_branches
    h5 = str(tmp_path / "of_single_weights.h5")
    _write_fake_gaitset_h5(h5, nbranch=1, ci_list=[1], seed=3)
    params = _tiny_2mod_params()
    out = warm_start_branches(params, {"gray": (h5, "of")})
    got = np.asarray(out["params"]["branch_gray"]["a_conv2"]["kernel"])
    assert not np.allclose(
        got, np.asarray(params["params"]["branch_gray"]["a_conv2"]["kernel"]))
