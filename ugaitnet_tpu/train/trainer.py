"""Experiment driver: chunked training loop with checkpointing, resume,
validation EER, LR plateau control, early stop and fine-tuning.

Re-derives the skeleton shared by all six reference training mains
(/root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:181-566):

  * experiment dir named from the hyperparameters (:299-307)
  * config dump (model-config + info.json -> config.json here)
  * resume from the newest checkpoint (mj_findLatestFileModel, :326-336)
  * epochs run in `save_every_epochs` chunks; checkpoint per chunk (:509-531)
  * per-chunk validation: loss/acc + verification EER on held-out videos
    (mains/..._1mod.py:571-585)
  * early stop when train accuracy passes 0.99 (:615-620)
  * optional extra_epochs fine-tune on train+val with the reference's new_lr
    heuristic (:541-560)
"""

from __future__ import annotations

import math
import os
from typing import Dict, Tuple

import jax
import numpy as np

from ugaitnet_tpu.core import checkpoint as ckpt
from ugaitnet_tpu.core.config import (DataConfig, ModelConfig, TrainConfig,
                                      dump_json)
from ugaitnet_tpu.data.pipeline import GaitPipeline
from ugaitnet_tpu.data.sampler import BalancedGaitSampler, split_train_val_by_video
from ugaitnet_tpu.data.schema import GaitDataset
from ugaitnet_tpu.eval.encode import encode_dataset
from ugaitnet_tpu.eval.verification import verification_eer
from ugaitnet_tpu.models.network import UGaitNet
from ugaitnet_tpu.obsv.logger import MetricsLogger
from ugaitnet_tpu.train.schedule import EarlyStopOnAccuracy, ReduceLROnPlateau
from ugaitnet_tpu.train.train_step import (
    Batch, TrainState, get_lr, init_state, make_optimizer, make_train_step,
    set_lr)


def experiment_name(mcfg: ModelConfig, dcfg: DataConfig, tcfg: TrainConfig,
                    prefix: str = "exp") -> str:
    """Config-encoding directory name (parity with the reference's subdir
    scheme, mains/..._CasiaB.py:299-301)."""
    mods = "+".join(b.modality for b in mcfg.branches)
    parts = [prefix, mods, mcfg.branches[0].kind, f"mg{mcfg.merge}",
             f"bs{dcfg.batch_size:03d}", f"lr{tcfg.lr:.6f}",
             f"m{tcfg.margin:g}", f"op{tcfg.optimizer}"]
    if mcfg.nclasses > 0:
        parts.append(f"c{mcfg.nclasses}")
    if tcfg.triplet_kind != "batch_all":
        parts.append(tcfg.triplet_kind)
    return "_".join(parts)


class Trainer:
    def __init__(self, mcfg: ModelConfig, dcfg: DataConfig, tcfg: TrainConfig,
                 experdir: str, use_tensorboard: bool = False,
                 mesh=None, norm_stats=None):
        self.norm_stats = norm_stats
        self.mcfg, self.dcfg, self.tcfg = mcfg, dcfg, tcfg
        self.experdir = experdir
        os.makedirs(experdir, exist_ok=True)
        dump_json(os.path.join(experdir, "config.json"),
                  model=mcfg, data=dcfg, train=tcfg)
        self.model = UGaitNet(mcfg)
        self.tx = make_optimizer(tcfg)
        self.mesh = mesh
        if mesh is not None:
            from ugaitnet_tpu.parallel.sharding import make_sharded_train_step
            self.step_fn = make_sharded_train_step(
                self.model, self.tx, mcfg, tcfg, mesh)
        else:
            self.step_fn = make_train_step(self.model, self.tx, mcfg, tcfg)
        self.logger = MetricsLogger(experdir, use_tensorboard)
        self.modalities = tuple(b.modality for b in mcfg.branches)

    # ------------------------------------------------------------------
    def init_or_resume(self, seed: int = 0) -> Tuple[TrainState, int]:
        state = init_state(self.model, self.tx, jax.random.PRNGKey(seed))
        last = ckpt.latest_checkpoint_step(self.experdir)
        start_epoch = 0
        if last is not None:
            state = ckpt.restore_checkpoint(self.experdir, last, state)
            start_epoch = int(last)
            print(f"* resumed from epoch {start_epoch}", flush=True)
        if self.mesh is not None:
            from ugaitnet_tpu.parallel.sharding import replicate
            state = replicate(state, self.mesh)
        return state, start_epoch

    def _epoch(self, state: TrainState, pipe: GaitPipeline,
               sampler: BalancedGaitSampler, epoch: int, seed: int
               ) -> Tuple[TrainState, Dict[str, float]]:
        from ugaitnet_tpu.data.pipeline import PrefetchLoader
        agg: Dict[str, float] = {}
        nsteps = max(len(sampler), 1)
        key0 = jax.random.PRNGKey(hash((seed, epoch)) % (2 ** 31))
        loader = PrefetchLoader(pipe, sampler, key0)
        for bix, (vols, flags, labels) in enumerate(loader):
            batch = Batch(tuple(vols), tuple(flags), labels)
            if self.mesh is not None:
                from ugaitnet_tpu.parallel.sharding import shard_batch
                batch = shard_batch(batch, self.mesh)
            state, metrics = self.step_fn(state, batch,
                                          jax.random.fold_in(key0, bix))
            loss = float(metrics["loss"])
            if not np.isfinite(loss):
                # failure detection: surface divergence immediately with a
                # recoverable message instead of training on garbage
                # (resume from the last per-chunk checkpoint)
                raise FloatingPointError(
                    f"non-finite loss {loss} at epoch {epoch} step {bix}; "
                    f"restart resumes from the last checkpoint in "
                    f"{self.experdir}")
            for k, v in metrics.items():
                agg[k] = agg.get(k, 0.0) + float(v)
        return state, {k: v / nsteps for k, v in agg.items()}

    def _validate(self, state: TrainState, ds: GaitDataset,
                  val_idx: np.ndarray, epoch: int = 0) -> Dict[str, float]:
        codes, labels, _, _ = encode_dataset(
            self.model, state.params, ds, self.modalities, typecode=3,
            batch_size=max(self.dcfg.batch_size, 32), indices=val_idx)
        # projector export + first-conv filter images, like the TUM mains'
        # per-chunk visual logging (mains/..._1mod.py:553-612)
        try:
            self.logger.export_embeddings(epoch, codes, labels)
            from ugaitnet_tpu.utils.net_utils import save_filter_grid
            p = state.params["params"]
            bkey = f"branch_{self.modalities[0]}"
            first = p[bkey].get("a_conv1", p[bkey].get("conv0"))
            if first is not None and "kernel" in first:
                save_filter_grid(
                    np.asarray(first["kernel"]),
                    os.path.join(self.experdir, "filters",
                                 f"conv1_{epoch:04d}.png"))
        except Exception:
            pass
        return verification_eer(codes, labels)

    # ------------------------------------------------------------------
    def fit(self, ds: GaitDataset, val_perc: float = 0.08,
            seed: int = 0) -> TrainState:
        tcfg, dcfg = self.tcfg, self.dcfg
        tr_idx, val_idx = split_train_val_by_video(ds.video_ids,
                                                   perc=val_perc, seed=seed)
        labmap = ds.label_map()
        pipe = GaitPipeline(ds, dcfg, self.modalities, labmap=labmap,
                            indices=tr_idx, norm_stats=self.norm_stats)
        sampler = BalancedGaitSampler(ds.labels[tr_idx], ds.gaits[tr_idx],
                                      dcfg.batch_size, dcfg.repetitions,
                                      seed=seed)
        state, epoch = self.init_or_resume(seed)
        plateau = ReduceLROnPlateau(lr=tcfg.lr, factor=0.1, patience=3,
                                    min_lr=tcfg.lr * 1e-3)
        early = EarlyStopOnAccuracy(0.99)

        while epoch < tcfg.epochs:
            state, m = self._epoch(state, pipe, sampler, epoch, seed)
            epoch += 1
            m["lr"] = get_lr(state)
            self.logger.log(epoch, m, prefix="train/")
            if epoch % tcfg.save_every_epochs == 0 or epoch == tcfg.epochs:
                ckpt.save_checkpoint(self.experdir, epoch, state)
                if len(val_idx) > 0:
                    vm = self._validate(state, ds, val_idx, epoch)
                    self.logger.log(epoch, vm, prefix="val/")
                new_lr = plateau.update(m.get("loss", 0.0))
                if not np.isclose(new_lr, get_lr(state), rtol=1e-5):
                    state = set_lr(state, new_lr)
                    print(f"* lr -> {new_lr:g}", flush=True)
            if "acc" in m and early.update(m["acc"]):
                print(f"* early stop at epoch {epoch} (train acc "
                      f"{m['acc']:.3f})", flush=True)
                break

        ckpt.save_checkpoint(self.experdir, epoch, state)

        # ---- extra fine-tune on train+val with the new_lr heuristic ----
        if tcfg.extra_epochs > 0 and len(val_idx) > 0:
            last_lr = get_lr(state)
            if self.mcfg.nclasses == 150:
                new_lr = (10 ** math.ceil(math.log10(last_lr))) * 0.1
            else:
                new_lr = min(10 ** math.ceil(math.log10(last_lr)), last_lr)
            state = set_lr(state, new_lr)
            full_pipe = GaitPipeline(ds, dcfg, self.modalities,
                                     labmap=labmap,
                                     norm_stats=self.norm_stats)
            full_sampler = BalancedGaitSampler(ds.labels, ds.gaits,
                                               dcfg.batch_size,
                                               dcfg.repetitions, seed=seed)
            target = tcfg.epochs + tcfg.extra_epochs
            while epoch < target:
                state, m = self._epoch(state, full_pipe, full_sampler,
                                       epoch, seed)
                epoch += 1
                self.logger.log(epoch, m, prefix="finetune/")
            ckpt.save_checkpoint(self.experdir, epoch, state)

        return state
