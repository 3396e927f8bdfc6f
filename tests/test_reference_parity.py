"""Golden numerical parity against the original TF reference implementation.

Builds the actual reference network (/root/reference/nets/mj_uwyhNets_ba.py,
run read-only as an oracle under legacy Keras with a minimal
tensorflow_addons stub), transplants its weights into UGaitNet, and checks
that signatures and class probabilities match on identical inputs — the
strongest possible parity evidence for the flagship 2-mod gaitset config.

Skipped automatically when tensorflow/tf_keras or the reference checkout is
unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "nets")),
    reason="reference checkout not available")


def _stub_tfa():
    if "tensorflow_addons" in sys.modules:
        return
    tfa = types.ModuleType("tensorflow_addons")
    mods = {"tensorflow_addons": tfa}
    for sub in ("losses", "utils", "optimizers"):
        m = types.ModuleType(f"tensorflow_addons.{sub}")
        setattr(tfa, sub, m)
        mods[f"tensorflow_addons.{sub}"] = m
    ml = types.ModuleType("tensorflow_addons.losses.metric_learning")
    tfa.losses.metric_learning = ml
    mods["tensorflow_addons.losses.metric_learning"] = ml

    class _D:  # constructors only; never executed
        def __init__(self, *a, **k):
            pass

    tfa.losses.TripletSemiHardLoss = _D
    tfa.losses.TripletHardLoss = _D
    tfa.losses.SigmoidFocalCrossEntropy = _D
    tfa.optimizers.AdamW = _D
    ty = types.ModuleType("tensorflow_addons.utils.types")
    ty.FloatTensorLike = float
    ty.TensorLike = object
    tfa.utils.types = ty
    mods["tensorflow_addons.utils.types"] = ty
    sys.modules.update(mods)


@pytest.fixture(scope="module")
def reference_model():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    tf = pytest.importorskip("tensorflow")
    pytest.importorskip("tf_keras")
    _stub_tfa()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    from nets.mj_uwyhNets_ba import UWYHSemiNet
    from tensorflow.keras.layers import Maximum
    from tensorflow.keras import optimizers

    model = UWYHSemiNet.build(
        input_shapes=[(25, 60, 60, 2), (25, 60, 60, 1)],
        number_convolutional_layers=4, filters_size=[7, 5, 3, 2],
        filters_numbers=[64, 128, 512, 512], ndense_units=[256],
        weight_decay=1e-4, dropout=[0.4, 0.4],
        optimizer=optimizers.SGD(0.01), margin=0.2, nclasses=74,
        loss_weights=[1.0, 0.1], fMerge=Maximum, fActivation="leaky",
        gaitset=True)
    return model


def _suffix(name, prefix):
    return int(name[len(prefix):].lstrip("_") or 0)


def test_flagship_signature_parity(reference_model):
    ref = reference_model
    tds = sorted([l for l in ref.layers
                  if type(l).__name__ == "TimeDistributed" and l.get_weights()],
                 key=lambda l: _suffix(l.name, "time_distributed"))
    convs = sorted([l for l in ref.layers if type(l).__name__ == "Conv2D"],
                   key=lambda l: _suffix(l.name, "conv2d"))
    mms = sorted([l for l in ref.layers if type(l).__name__ == "MatMul"],
                 key=lambda l: _suffix(l.name, "mat_mul"))
    assert len(tds) == 12 and len(convs) == 8 and len(mms) == 2
    classprob = ref.get_layer("classprob")

    rng = np.random.RandomState(42)
    for l in tds + convs + mms + [classprob]:
        l.set_weights([rng.randn(*w.shape).astype(np.float32) * 0.05
                       for w in l.get_weights()])

    B = 3
    of = rng.randn(B, 25, 60, 60, 2).astype(np.float32) * 0.3
    gray = rng.randn(B, 25, 60, 60, 1).astype(np.float32) * 0.3
    uof = np.array([1.0, 1.0, 0.0], np.float32).reshape(B, 1)
    ugray = np.array([1.0, 0.0, 1.0], np.float32).reshape(B, 1)
    sig_ref, prob_ref = ref.predict([of, uof, gray, ugray], verbose=0)

    # ---- transplant into ugaitnet_tpu ---------------------------------
    import jax
    import jax.numpy as jnp
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
    from ugaitnet_tpu.models.network import UGaitNet, init_params

    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="max", nclasses=74, l2_mode="reference")
    model = UGaitNet(mcfg)
    params = init_params(model, jax.random.PRNGKey(0), batch=2)
    p = params["params"]

    def load_branch(bp, tds6, convs4, mm):
        for i, l in enumerate(tds6, 1):
            bp[f"a_conv{i}"]["kernel"] = jnp.asarray(l.get_weights()[0])
        for i, l in enumerate(convs4, 1):
            bp[f"b_conv{i}"]["kernel"] = jnp.asarray(l.get_weights()[0])
        bp["part_proj"] = jnp.asarray(mm.get_weights()[0])

    load_branch(p["branch_of"], tds[:6], convs[:4], mms[0])
    load_branch(p["branch_gray"], tds[6:], convs[4:], mms[1])
    p["classprob"]["kernel"] = jnp.asarray(classprob.get_weights()[0])
    p["classprob"]["bias"] = jnp.asarray(classprob.get_weights()[1])

    out = model.apply({"params": p},
                      [jnp.asarray(of), jnp.asarray(gray)],
                      [jnp.asarray(uof[:, 0]), jnp.asarray(ugray[:, 0])],
                      train=False)
    sig_mine = np.transpose(np.asarray(out["signature"]), (1, 0, 2))
    prob_mine = np.asarray(out["classprob"])

    # fp32 conv accumulation order differs between backends; signatures are
    # O(1) normalized values, so 1e-3 abs tolerance is ~1e-3 relative.
    np.testing.assert_allclose(sig_mine, sig_ref, atol=1.5e-3)
    np.testing.assert_allclose(prob_mine, prob_ref, atol=1e-4)
