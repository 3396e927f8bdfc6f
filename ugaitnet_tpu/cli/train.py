"""Training entry point.

Mirrors the flag surface of the reference training mains
(/root/reference/mains/mj_trainUWYHGaitNet_DataGen_CasiaB.py:568-769 and
siblings) on top of the TPU-native stack: one CLI covers the 1/2/3-modality
regimes, branch kinds, merges, and sharding.

Examples:
  # flagship CASIA-B 2-mod config (gaitset + sign_max, README.md:31-50)
  python -m ugaitnet_tpu.cli.train --datadir /data/casiab_packed \
      --mod0 of --mod1 gray --nclasses 74 --gaitset --mergefun sign_max \
      --bs 40 --lr 1e-4 --margin 0.2 --wver 1.0 --wid 0.1 \
      --epochs 75 --extraepochs 25 --repetitions 5 --experdir /exp

  # smoke run on synthetic data
  python -m ugaitnet_tpu.cli.train --synthetic --epochs 2 --bs 8
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("ugaitnet-train")
    p.add_argument("--datadir", type=str, default="",
                   help="packed GaitDataset directory (data/schema.py)")
    p.add_argument("--datadir2", type=str, default="",
                   help="second packed dataset for joint (BothDatasets) "
                        "training: labels +305, gaits +3")
    p.add_argument("--normstats", action="store_true",
                   help="per-dataset plane-wise mean/std standardization "
                        "(BothDatasets normalize_paths equivalent)")
    p.add_argument("--synthetic", action="store_true",
                   help="train on the synthetic in-memory dataset")
    p.add_argument("--experdir", type=str, default="./experiments")
    p.add_argument("--experfix", type=str, default="demo")
    p.add_argument("--mod0", type=str, default="of")
    p.add_argument("--mod1", type=str, default="gray")
    p.add_argument("--mod2", type=str, default="",
                   help="third modality (e.g. depth) for 3-mod training")
    p.add_argument("--singlemod", action="store_true",
                   help="single-modality net (uses --mod0 only)")
    p.add_argument("--nclasses", type=int, default=None,
                   help="default 74 (8 with --synthetic)")
    p.add_argument("--gaitset", action="store_true", default=True)
    p.add_argument("--no-gaitset", dest="gaitset", action="store_false")
    p.add_argument("--use3d", action="store_true",
                   help="3D conv branches instead of 2D")
    p.add_argument("--mergefun", type=str, default="max",
                   choices=["max", "average", "sign_max"])
    p.add_argument("--casenet", type=str, default="D",
                   help="B/D: no extra dense; C: extra 256-d code head")
    p.add_argument("--postriplet", type=int, default=1)
    p.add_argument("--auxlosses", action="store_true")
    p.add_argument("--bs", "--batchsize", dest="bs", type=int, default=40)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--dropout", type=float, default=0.4)
    p.add_argument("--optimizer", type=str, default="adam")
    p.add_argument("--margin", type=float, default=0.2)
    p.add_argument("--wver", type=float, default=1.0,
                   help="triplet loss weight")
    p.add_argument("--wid", type=float, default=0.1, help="id CE weight")
    p.add_argument("--softlabel", type=float, default=0.0)
    p.add_argument("--focal", action="store_true")
    p.add_argument("--onlytriplet", action="store_true",
                   help="drop the id-CE term (BothDatasets only_triplet)")
    p.add_argument("--normbfmerge", action="store_true",
                   help="L2-normalize branch embeddings before the merge")
    p.add_argument("--tripletkind", type=str, default="batch_all",
                   choices=["batch_all", "semi_hard", "hard"])
    p.add_argument("--epochs", type=int, default=75)
    p.add_argument("--extraepochs", type=int, default=0)
    p.add_argument("--savemodelfreq", type=int, default=5)
    p.add_argument("--repetitions", type=int, default=5)
    p.add_argument("--buildgaits", type=str, default="",
                   help="comma-separated gait-group ids, one per sorted "
                        "unique gait code; equal ids share one balanced "
                        "sampling slot (BothDatasets joint regime, e.g. "
                        "'0,1,2,0,4,5' merges TUM n with CASIA nm)")
    p.add_argument("--expandlevel", type=int, default=3)
    p.add_argument("--noaugment", action="store_true")
    p.add_argument("--valperc", type=float, default=0.08)
    p.add_argument("--ndevices", type=int, default=0,
                   help="data-parallel devices (0 = single device)")
    p.add_argument("--tp", type=int, default=0,
                   help="model-parallel devices: builds a (ndevices x tp) "
                        "2D mesh sharding conv channels and the part head "
                        "(parallel/tensor.py); 0 = off")
    p.add_argument("--sp", type=int, default=0,
                   help="sequence-parallel devices: builds a (ndevices x "
                        "sp) 2D mesh sharding the gait set (time) axis — "
                        "frame convs run on T/sp frames per device, set "
                        "pools close over ICI (parallel/sequence.py); "
                        "0 = off, exclusive with --tp")
    p.add_argument("--pp", type=int, default=0,
                   help="pipeline (branch-placement) parallel devices: "
                        "branch trunk i runs on device i, the head stage "
                        "and optimizer on device 0, activations move "
                        "point-to-point (parallel/pipeline.py); 0 = off, "
                        "exclusive with the mesh modes")
    p.add_argument("--ep", type=int, default=0,
                   help="expert-parallel devices: builds a (ndevices x ep) "
                        "2D mesh sharding the MoE expert axis "
                        "(parallel/expert.py); requires --moe, 0 = off, "
                        "exclusive with --tp/--sp/--pp")
    p.add_argument("--asyncckpt", action="store_true",
                   help="write checkpoints on orbax's background thread "
                        "(training never blocks on serialization/disk)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize branch activations in backward "
                        "(jax.checkpoint): ~1/3 extra conv FLOPs for a "
                        "much smaller HBM peak -> larger per-chip batch")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay fp32)")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--initnet", type=str, default="",
                   help="warm-start the WHOLE net from a prior experiment "
                        "dir (or Keras h5); classifier head kept fresh when "
                        "nclasses differs (reference --initnet)")
    p.add_argument("--initbranch", type=str, action="append", default=[],
                   help="per-branch warm start: mod=path, mod=path@srcmod "
                        "or mod=path@<branch index> (repeatable). "
                        "mod=path@of reproduces the reference's "
                        "gray-from-OF gaitset init quirk "
                        "(mj_uwyhNets_ba.py:765)")
    p.add_argument("--initepoch", type=str, default="-1",
                   help="checkpoint epoch for --initnet/--initbranch "
                        "(-1 latest, or 'best')")
    p.add_argument("--gschannels", type=str, default="",
                   help="gaitset stage widths 'c1,c2,c3' (default 32,64,128;"
                        " smaller for smoke runs / sweeps)")
    p.add_argument("--gspartdim", type=int, default=0,
                   help="gaitset per-part projection dim (default 256)")
    p.add_argument("--moe", type=int, default=0,
                   help="MoE part projection with this many experts "
                        "(beyond reference, ops/moe.py): a learned top-1 "
                        "router over (batch, part) tokens replaces the "
                        "fixed per-part MatMul; 0 = off")
    p.add_argument("--moecap", type=float, default=1.25,
                   help="MoE expert capacity factor (tokens past "
                        "capacity*N/E per expert are dropped)")
    return p


def configs_from_args(args):
    from ugaitnet_tpu.core.config import (BranchConfig, DataConfig,
                                          ModelConfig, TrainConfig)
    kind = "gaitset" if args.gaitset else ("conv3d" if args.use3d
                                           else "conv2d")
    mods = [args.mod0]
    if not args.singlemod:
        mods.append(args.mod1)
        if args.mod2:
            mods.append(args.mod2)
    extra = {}
    if args.gschannels:
        extra["gaitset_channels"] = tuple(
            int(x) for x in args.gschannels.replace(",", " ").split())
    if args.gspartdim:
        extra["part_dim"] = args.gspartdim
    if args.moe:
        if kind != "gaitset":
            raise SystemExit("--moe requires gaitset branches (the MoE "
                             "head replaces the per-part projection)")
        extra["moe_experts"] = args.moe
        extra["moe_capacity_factor"] = args.moecap
    branches = tuple(
        BranchConfig(kind=kind, modality=m, dropout=args.dropout, **extra)
        for m in mods)
    mcfg = ModelConfig(
        branches=branches, merge=args.mergefun, nclasses=args.nclasses,
        extra_dense=(256,) if args.casenet == "C" else (),
        postriplet=args.postriplet, dropout_code=args.dropout,
        aux_losses=args.auxlosses, norm_before_merge=args.normbfmerge,
        compute_dtype="bfloat16" if args.bf16 else "float32",
        remat=args.remat)
    dcfg = DataConfig(batch_size=args.bs, expand_level=args.expandlevel,
                      repetitions=args.repetitions,
                      augment=not args.noaugment,
                      gait_groups=(tuple(
                          int(x) for x in args.buildgaits.replace(
                              ",", " ").split())
                          if args.buildgaits else None))
    tcfg = TrainConfig(
        optimizer=args.optimizer, lr=args.lr, epochs=args.epochs,
        extra_epochs=args.extraepochs, margin=args.margin,
        loss_weights=(args.wver, args.wid), label_smoothing=args.softlabel,
        use_focal=args.focal, only_triplet=args.onlytriplet,
        triplet_kind=args.tripletkind,
        save_every_epochs=args.savemodelfreq, seed=args.seed,
        dp_devices=args.ndevices, tp_devices=args.tp, sp_devices=args.sp,
        pp_devices=args.pp, ep_devices=args.ep,
        async_checkpoint=args.asyncckpt)
    return mcfg, dcfg, tcfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ugaitnet_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()
    from ugaitnet_tpu.data.schema import GaitDataset
    from ugaitnet_tpu.data.synthetic import make_synthetic_dataset
    from ugaitnet_tpu.train.trainer import Trainer, experiment_name

    if args.nclasses is None:
        # --synthetic defaults to a smoke-sized 8 classes so the module
        # docstring's example runs out of the box; real data keeps the
        # reference's 74
        args.nclasses = 8 if args.synthetic else 74
    mcfg, dcfg, tcfg = configs_from_args(args)
    if args.synthetic:
        if args.nclasses > 16:
            raise SystemExit("--synthetic needs --nclasses <= 16")
        ds = make_synthetic_dataset(
            num_subjects=max(args.nclasses, 2),
            modalities=tuple(b.modality for b in mcfg.branches))
    else:
        if not args.datadir:
            raise SystemExit("--datadir or --synthetic required")
        ds = GaitDataset.load(args.datadir)
        if args.datadir2:
            from ugaitnet_tpu.data.convert import combine_datasets
            ds = combine_datasets(ds, GaitDataset.load(args.datadir2))

    experdir = os.path.join(
        args.experdir, experiment_name(mcfg, dcfg, tcfg, args.experfix))
    print(f"* experiment dir: {experdir}", flush=True)

    mesh = None
    if sum(1 for d in (tcfg.tp_devices, tcfg.sp_devices,
                       tcfg.ep_devices) if d) > 1:
        raise SystemExit("--tp/--sp/--ep are exclusive (one 2D mesh each); "
                         "pick the sharding that relieves your bottleneck")
    if tcfg.pp_devices and (tcfg.tp_devices or tcfg.sp_devices
                            or tcfg.ep_devices or tcfg.dp_devices):
        raise SystemExit("--pp is exclusive with --ndevices/--tp/--sp/--ep "
                         "(branch placement orchestrates devices itself)")
    if tcfg.ep_devices and not mcfg.has_moe:
        raise SystemExit("--ep requires --moe (there is no expert axis "
                         "to shard otherwise)")
    if tcfg.pp_devices:
        pass  # no mesh — Trainer builds the pipeline step from pp_devices
    elif tcfg.ep_devices:
        # 2D (data, expert) mesh: --ndevices x --ep (dp defaults to 1)
        from ugaitnet_tpu.parallel.expert import make_mesh_dpep
        mesh = make_mesh_dpep(max(1, tcfg.dp_devices), tcfg.ep_devices)
    elif tcfg.tp_devices:
        # 2D (data, model) mesh: --ndevices x --tp (dp defaults to 1)
        from ugaitnet_tpu.parallel.tensor import make_mesh2d
        mesh = make_mesh2d(max(1, tcfg.dp_devices), tcfg.tp_devices)
    elif tcfg.sp_devices:
        # 2D (data, seq) mesh: --ndevices x --sp (dp defaults to 1)
        from ugaitnet_tpu.parallel.sequence import make_mesh_dpsp
        mesh = make_mesh_dpsp(max(1, tcfg.dp_devices), tcfg.sp_devices)
    elif tcfg.dp_devices:
        from ugaitnet_tpu.parallel.sharding import make_mesh
        mesh = make_mesh(tcfg.dp_devices)

    norm_stats = None
    if args.normstats:
        import numpy as np
        from ugaitnet_tpu.data.pipeline import compute_normalization_stats
        src = getattr(ds, "dataset_source", None)
        sources = ((src == 0, src == 1) if src is not None else (None,))
        norm_stats = {}
        for b in mcfg.branches:
            stats = [compute_normalization_stats(ds, b.modality, sel)
                     for sel in sources]
            norm_stats[b.modality] = (np.stack([s[0] for s in stats]),
                                      np.stack([s[1] for s in stats]))

    warm_start = None
    if args.initnet or args.initbranch:
        from ugaitnet_tpu.utils.warm_start import (
            parse_initbranch_specs, warm_start_branches, warm_start_full)
        epoch = args.initepoch if args.initepoch == "best" \
            else int(args.initepoch)
        mods = tuple(b.modality for b in mcfg.branches)
        specs = parse_initbranch_specs(args.initbranch, mods)

        def warm_start(params, _e=epoch, _specs=specs, _full=args.initnet):
            if _full:
                params = warm_start_full(params, _full, _e)
            if _specs:
                params = warm_start_branches(params, _specs, _e)
            return params

    trainer = Trainer(mcfg, dcfg, tcfg, experdir,
                      use_tensorboard=args.tensorboard, mesh=mesh,
                      norm_stats=norm_stats, warm_start=warm_start)
    trainer.fit(ds, val_perc=args.valperc, seed=args.seed)
    print("* training done", flush=True)
    return experdir


if __name__ == "__main__":
    main()
