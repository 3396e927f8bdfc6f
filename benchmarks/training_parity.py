"""Training-dynamics parity vs the ACTUAL TF reference stack (VERDICT r4 #1).

Forward parity (weight transplant) and loss-value parity were already
pinned; this module closes the remaining gap between "forward-equal" and
"will reproduce the reference's accuracy": it steps BOTH stacks — the
reference UWYHSemiNet flagship built read-only from /root/reference
(nets/mj_uwyhNets_ba.py:669-935: gaitset branches, Maximum fusion,
batch-axis L2 signature, triplet+CCE at loss_weights [1.0, 0.1], Keras
Adam) and our UGaitNet with `optimizer="adam_keras"` — from IDENTICAL
glorot init (ref h5 -> load_keras_weights) on IDENTICAL fixed P x K
batches, and records the per-step total-loss trajectory plus post-training
raw fused-embedding agreement.

Two entry points:
  trajectory()   — the N-step loss table (tests/test_reference_parity.py::
                   test_training_dynamics_parity runs the 4-step version)
  head_to_head() — train both stacks on the SAME synthetic identity set
                   (same batch stream from our pipeline), then encode a
                   held-out draw with each stack's own forward and score
                   Rank-1 + EER through the camera-pair protocol (the
                   protocol math itself is reference-pinned elsewhere:
                   tests/test_reference_parity.py kNN/EER crosschecks).

Run as a script to (re)produce benchmarks/results_training_parity.json.

Expected physics, documented so nobody "fixes" it: two fp32 stacks with
different accumulation orders (XLA vs oneDNN) diverge EXPONENTIALLY under
training (each step amplifies representation noise through the gradient),
so per-step abs_diff grows ~10x every few steps from ~1e-7 at step 0.
What parity means here is (a) step-0 loss equality to fp32 noise — the
loss assembly is identical, (b) smooth small divergence over short
horizons — same dynamics, no systematic optimizer/weighting mismatch, and
(c) statistically equal endpoint accuracy — head_to_head.
"""

import json
import os
import sys
import time
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = "/root/reference"


def _stub_tfa():
    """Minimal tensorflow_addons stub (constructors only) so the reference
    module imports without the real package (same as tests/test_reference_parity)."""
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

    class _D:
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


def _ref_env():
    os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
    # Pin TF to one thread BEFORE its context initializes: on this 1-core
    # host TF's default inter-op pool spin-waits and QUADRUPLES the jax
    # side's step time when both stacks live in one process (measured
    # 62 s vs 16 s for the same flagship grad).
    os.environ.setdefault("TF_NUM_INTRAOP_THREADS", "1")
    os.environ.setdefault("TF_NUM_INTEROP_THREADS", "1")
    _stub_tfa()
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    try:
        import tensorflow as tf
        tf.config.threading.set_intra_op_parallelism_threads(1)
        tf.config.threading.set_inter_op_parallelism_threads(1)
    except (ImportError, RuntimeError):
        pass  # already initialized (env vars above still applied) or no TF


def build_reference(lr: float, nclasses: int = 74, seed: int = 0):
    """The flagship 2-mod gaitset net, compiled exactly as the training
    mains do (mj_uwyhNets_ba.py:861-933): [triplet(0.2), CCE] at
    loss_weights [1.0, 0.1], Keras Adam.

    seed pins TF's glorot draw: the step-0 loss diff between the stacks is
    pure fp32 accumulation noise, whose magnitude VARIES with the init
    (measured 2e-6 .. 3e-5 across unseeded draws) — reproducible artifacts
    and stable test thresholds need the draw fixed."""
    _ref_env()
    import tensorflow as tf
    tf.keras.utils.set_random_seed(seed)
    from nets.mj_uwyhNets_ba import UWYHSemiNet
    from tensorflow.keras.layers import Maximum
    from tensorflow.keras import optimizers

    return UWYHSemiNet.build(
        input_shapes=[(25, 60, 60, 2), (25, 60, 60, 1)],
        number_convolutional_layers=4, filters_size=[7, 5, 3, 2],
        filters_numbers=[64, 128, 512, 512], ndense_units=[256],
        weight_decay=1e-4, dropout=[0.0, 0.0],
        optimizer=optimizers.Adam(learning_rate=lr), margin=0.2,
        nclasses=nclasses, loss_weights=[1.0, 0.1], fMerge=Maximum,
        fActivation="leaky", gaitset=True)


def _build_ours(nclasses: int):
    from ugaitnet_tpu.core.config import BranchConfig, ModelConfig
    from ugaitnet_tpu.models.network import UGaitNet

    mcfg = ModelConfig(
        branches=(BranchConfig(kind="gaitset", modality="of"),
                  BranchConfig(kind="gaitset", modality="gray")),
        merge="max", nclasses=nclasses, l2_mode="reference")
    return UGaitNet(mcfg), mcfg


def _transplant(ref, workdir: str, model, nclasses: int):
    """ref glorot init -> h5 -> our params (the tested migration path)."""
    import jax
    from ugaitnet_tpu.models.network import init_params
    from ugaitnet_tpu.utils.keras_import import load_keras_weights

    h5path = os.path.join(workdir, "ref_init.h5")
    ref.save_weights(h5path)
    return load_keras_weights(
        h5path, init_params(model, jax.random.PRNGKey(0), batch=2))


def _fixed_batches(n_steps: int, batch: int, nclasses: int, seed: int):
    """Balanced P x K batches (K=3), same arrays fed to both stacks."""
    assert batch % 3 == 0
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n_steps):
        of = (rng.randn(batch, 25, 60, 60, 2) * 0.3).astype(np.float32)
        gray = (rng.randn(batch, 25, 60, 60, 1) * 0.3).astype(np.float32)
        ids = rng.choice(nclasses, size=batch // 3, replace=False)
        labels = np.repeat(ids, 3).astype(np.int32)
        out.append((of, gray, labels))
    return out


def trajectory(workdir: str, n_steps: int = 10, batch: int = 12,
               lr: float = 1e-4, nclasses: int = 74, seed: int = 0) -> dict:
    """Per-step total-loss table, both stacks from identical init on
    identical batches, dropout 0 (the flagship gaitset path has no dropout
    layers anyway), plus post-training raw fused-embedding agreement."""
    _ref_env()
    import jax
    import jax.numpy as jnp
    from ugaitnet_tpu.core.config import TrainConfig
    from ugaitnet_tpu.train.train_step import (Batch, TrainState,
                                               make_optimizer,
                                               make_train_step)

    ref = build_reference(lr, nclasses)
    model, mcfg = _build_ours(nclasses)
    params = _transplant(ref, workdir, model, nclasses)

    tcfg = TrainConfig(optimizer="adam_keras", lr=lr, margin=0.2,
                       loss_weights=(1.0, 0.1), triplet_kind="batch_all")
    tx = make_optimizer(tcfg)
    step = make_train_step(model, tx, mcfg, tcfg)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params))

    batches = _fixed_batches(n_steps, batch, nclasses, seed)
    ones = np.ones(batch, np.float32)

    steps = []
    key = jax.random.PRNGKey(seed)
    for i, (of, gray, labels) in enumerate(batches):
        onehot = np.zeros((batch, nclasses), np.float32)
        onehot[np.arange(batch), labels] = 1.0
        t0 = time.time()
        ref_out = ref.train_on_batch(
            [of, ones.reshape(-1, 1), gray, ones.reshape(-1, 1)],
            [labels.reshape(-1, 1).astype(np.float32), onehot])
        t_ref = time.time() - t0
        ref_loss = float(ref_out[0] if isinstance(ref_out, (list, tuple))
                         else ref_out)

        b = Batch((jnp.asarray(of), jnp.asarray(gray)),
                  (jnp.asarray(ones), jnp.asarray(ones)),
                  jnp.asarray(labels))
        t0 = time.time()
        state, metrics = step(state, b, key)
        our_loss = float(metrics["loss"])
        t_ours = time.time() - t0
        steps.append({"step": i, "ref_loss": ref_loss, "our_loss": our_loss,
                      "abs_diff": abs(ref_loss - our_loss),
                      "ref_seconds": round(t_ref, 2),
                      "our_seconds": round(t_ours, 2)})

    # post-training raw fused embeddings (PRE the batch-axis L2 quirk,
    # which amplifies near-zero columns into +-1 noise) on a fresh probe
    import tensorflow as tf  # noqa: F401  (env pinned by _ref_env)
    from tensorflow.keras import Model
    rng = np.random.RandomState(seed + 1)
    of = (rng.randn(batch, 25, 60, 60, 2) * 0.3).astype(np.float32)
    gray = (rng.randn(batch, 25, 60, 60, 1) * 0.3).astype(np.float32)
    fused_ref = Model(ref.inputs, ref.get_layer("fusion").output).predict(
        [of, ones.reshape(-1, 1), gray, ones.reshape(-1, 1)], verbose=0)
    out = model.apply(state.params, [jnp.asarray(of), jnp.asarray(gray)],
                      [jnp.asarray(ones), jnp.asarray(ones)], train=False)
    fused_ours = np.transpose(np.asarray(out["fused"]), (1, 0, 2))
    a, b_ = fused_ref.ravel(), fused_ours.ravel()
    cosine = float(np.dot(a, b_) / (np.linalg.norm(a) * np.linalg.norm(b_)))
    rel_fro = float(np.linalg.norm(a - b_) / np.linalg.norm(a))

    return {
        "config": {"n_steps": n_steps, "batch": batch, "lr": lr,
                   "nclasses": nclasses, "optimizer": "adam_keras vs "
                   "tf_keras Adam", "loss_weights": [1.0, 0.1],
                   "margin": 0.2, "dropout": 0.0},
        "steps": steps,
        "post_train_fused_cosine": cosine,
        "post_train_fused_rel_fro": rel_fro,
    }


def _encode_ref_flat(ref, pipe, n: int, batch_size: int,
                     channels_first: bool = False) -> np.ndarray:
    """Encode a dataset through the REFERENCE forward, chunked exactly like
    eval/encode.py (sequential order, trailing batch padded) so the
    batch-axis signature L2 sees identical batch compositions.
    channels_first: conv2d family — fold (T,H,W,C) -> (T*C,H,W)."""
    from ugaitnet_tpu.data.sampler import SequentialSampler

    codes = []
    import jax
    key = jax.random.PRNGKey(0)
    for batch_idx in SequentialSampler(n, batch_size).epoch():
        pad = batch_size - len(batch_idx)
        idx = np.concatenate([batch_idx, batch_idx[:1].repeat(pad)]) \
            if pad else batch_idx
        vols, flags, _ = pipe.load(idx, key, expand=1)
        of, gray = (np.asarray(v, np.float32) for v in vols)
        if channels_first:
            of = np.moveaxis(of, -1, -3).reshape(len(idx), -1, 60, 60)
            gray = np.moveaxis(gray, -1, -3).reshape(len(idx), -1, 60, 60)
        ones = np.ones((len(idx), 1), np.float32)
        sig = ref.predict([of, ones, gray, ones], verbose=0)
        if isinstance(sig, list):
            sig = sig[0]
        if sig.ndim == 3:  # gaitset (P,B,D) -> (B, P*D)
            flat = np.transpose(sig, (1, 0, 2)).reshape(sig.shape[1], -1)
        else:              # conv2d (B,D)
            flat = sig
        codes.append(flat[:len(batch_idx)])
    return np.concatenate(codes)


def _score(codes: np.ndarray, labels: np.ndarray, vids: np.ndarray,
           cams: np.ndarray) -> dict:
    """Camera-pair Rank-1 (probe cam 0, galleries cams 1,2) + pooled EER."""
    from ugaitnet_tpu.eval.protocol import EncodedSet, eval_camera_pairs
    from ugaitnet_tpu.ops.metrics import eer_verif_dist

    psel = np.where(cams == 0)[0]
    gsel = np.where(cams != 0)[0]
    probe = EncodedSet(codes[psel], labels[psel], vids[psel], cams[psel])
    gal = EncodedSet(codes[gsel], labels[gsel], vids[gsel], cams[gsel])
    res = eval_camera_pairs(gal, probe, probe_camera=0, knn=1,
                            cameras=(0, 1, 2))
    d2 = ((probe.codes[:, None, :] - gal.codes[None, :, :]) ** 2).sum(-1)
    gt = (probe.labels[:, None] == gal.labels[None, :]).astype(np.int64)
    eer, _ = eer_verif_dist(gt.ravel(), np.sqrt(d2).ravel())
    return {"rank1_subseq": res["rank1_subseq"],
            "rank1_video": res["rank1_video"], "eer": eer}


def head_to_head(workdir: str, num_subjects: int = 8, epochs: int = 10,
                 batch: int = 12, lr: float = 1e-3, seed: int = 0) -> dict:
    """Train BOTH stacks on the same synthetic identity set fed the same
    batch stream (our pipeline, augment off), encode a held-out draw with
    each stack's OWN forward, score each through the camera-pair protocol.

    Uses the flagship gaitset family: it is the only reference family whose
    nclasses>0 build trains through triplet_loss_all (the conv2d/conv3d
    heads emit 2D signatures, which the reference's (P,B,D) triplet loss
    and classprob transpose reject — those families train as
    verification/pair nets instead, covered by make_pair_train_step)."""
    _ref_env()
    import jax
    import jax.numpy as jnp
    from ugaitnet_tpu.core.config import DataConfig, TrainConfig
    from ugaitnet_tpu.data.pipeline import GaitPipeline
    from ugaitnet_tpu.data.sampler import BalancedGaitSampler
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.eval.encode import encode_dataset
    from ugaitnet_tpu.train.train_step import (Batch, TrainState,
                                               make_optimizer,
                                               make_train_step)

    train_ds = make_synthetic_dataset(num_subjects=num_subjects,
                                      videos_per_subject=3,
                                      subseqs_per_video=3, seed=seed,
                                      template_seed=7, name="h2h_train")
    eval_ds = make_synthetic_dataset(num_subjects=num_subjects,
                                     videos_per_subject=3,
                                     subseqs_per_video=3, seed=seed + 1,
                                     template_seed=7, name="h2h_eval")

    ref = build_reference(lr, nclasses=num_subjects)
    model, mcfg = _build_ours(num_subjects)
    params = _transplant(ref, workdir, model, num_subjects)

    tcfg = TrainConfig(optimizer="adam_keras", lr=lr, margin=0.2,
                       loss_weights=(1.0, 0.1), triplet_kind="batch_all")
    tx = make_optimizer(tcfg)
    step = make_train_step(model, tx, mcfg, tcfg)
    state = TrainState(step=jnp.int32(0), params=params,
                       opt_state=tx.init(params))

    dcfg = DataConfig(batch_size=batch, repetitions=3, expand_level=1,
                      augment=False)
    labmap = train_ds.label_map()
    pipe = GaitPipeline(train_ds, dcfg, ("of", "gray"), labmap=labmap,
                        augment=False)
    sampler = BalancedGaitSampler(train_ds.labels, train_ds.gaits,
                                  batch_size=batch, repetition=3, seed=seed)
    key = jax.random.PRNGKey(seed)
    losses_ref, losses_ours = [], []
    n_steps = 0
    for ep in range(epochs):
        for _ in range(len(sampler)):
            idx = sampler.next_batch()
            vols, flags, labels = pipe.load(idx, jax.random.fold_in(
                key, n_steps), expand=1)
            of, gray = (np.asarray(v, np.float32) for v in vols)
            lab = np.asarray(labels)
            ones = np.ones((len(lab), 1), np.float32)
            onehot = np.zeros((len(lab), num_subjects), np.float32)
            onehot[np.arange(len(lab)), lab] = 1.0
            r = ref.train_on_batch(
                [of, ones, gray, ones],
                [lab.reshape(-1, 1).astype(np.float32), onehot])
            losses_ref.append(float(r[0] if isinstance(r, (list, tuple))
                                    else r))
            b = Batch((jnp.asarray(of), jnp.asarray(gray)),
                      (jnp.asarray(ones[:, 0]), jnp.asarray(ones[:, 0])),
                      jnp.asarray(lab))
            state, metrics = step(state, b, key)
            losses_ours.append(float(metrics["loss"]))
            n_steps += 1
        sampler.on_epoch_end()

    # ---- each stack encodes the held-out draws with its own forward ----
    bs = 24
    codes_ours, labels_e, vids_e, cams_e = encode_dataset(
        model, state.params, eval_ds, ("of", "gray"), typecode=3,
        batch_size=bs)
    epipe = GaitPipeline(eval_ds, DataConfig(batch_size=bs, expand_level=1,
                                             augment=False),
                         ("of", "gray"), labmap=None, augment=False)
    codes_ref = _encode_ref_flat(ref, epipe, len(eval_ds.labels), bs)

    ours = _score(codes_ours, labels_e, vids_e, cams_e)
    refs = _score(codes_ref, eval_ds.labels, eval_ds.video_ids,
                  eval_ds.cams)
    return {
        "config": {"num_subjects": num_subjects, "epochs": epochs,
                   "steps": n_steps, "batch": batch, "lr": lr,
                   "chance_rank1": 1.0 / num_subjects},
        "final_loss_ref": losses_ref[-1], "final_loss_ours": losses_ours[-1],
        "mean_loss_last_epoch_ref": float(np.mean(
            losses_ref[-len(sampler):])),
        "mean_loss_last_epoch_ours": float(np.mean(
            losses_ours[-len(sampler):])),
        "reference": refs, "ours": ours,
    }


if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS",
                          "--xla_force_host_platform_device_count=8")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tempfile

    out = {}
    with tempfile.TemporaryDirectory() as d:
        t0 = time.time()
        out["trajectory"] = trajectory(d, n_steps=10, batch=12, lr=1e-4)
        out["trajectory"]["wall_seconds"] = round(time.time() - t0, 1)
        t0 = time.time()
        out["head_to_head"] = head_to_head(d)
        out["head_to_head"]["wall_seconds"] = round(time.time() - t0, 1)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_training_parity.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))
