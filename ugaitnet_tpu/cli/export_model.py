"""Export a trained experiment as a self-contained serving artifact.

    python -m ugaitnet_tpu.cli.export_model \
        --experdir experiments/casiab_2mod --epoch best \
        --out artifacts/casiab_2mod --buckets 1 8 32 128

Loads the checkpoint, bakes the parameters into per-bucket StableHLO
executables of the raw->signature encoder (eval/export.py), and writes a
directory a serving process can load with `ExportedEncoder(path)` — no
model code, checkpoint plumbing or retracing at serving time.  Run it on
the platform you will serve on (the artifact is platform-bound).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--experdir", type=str, required=True,
                   help="experiment dir (config.json + checkpoints)")
    p.add_argument("--epoch", type=str, default="-1",
                   help="checkpoint epoch, -1 = latest, 'best'")
    p.add_argument("--out", type=str, required=True,
                   help="output artifact directory")
    p.add_argument("--buckets", type=int, nargs="+",
                   default=[1, 8, 32, 128],
                   help="query batch sizes to precompile")
    p.add_argument("--typecode", type=int, default=3)
    p.add_argument("--knn", type=int, default=3)
    p.add_argument("--ntype", type=int, default=2,
                   help="OF dequantization scale convention of the data "
                        "this artifact will serve (dataset ntype)")
    p.add_argument("--warmup", action="store_true",
                   help="load the artifact back and run every bucket "
                        "once, so the platform's compile cache is "
                        "populated and a serving process's first query "
                        "is steady-state")
    p.add_argument("--keras-h5", type=str, default="",
                   help="ALSO write the checkpoint as a reference-layout "
                        "Keras h5 weights file at this path (loadable by "
                        "the original repo's mains) — requires "
                        "--keras-template")
    p.add_argument("--keras-template", type=str, default="",
                   help="an h5 produced by the reference architecture's "
                        "save_weights (e.g. any of its per-epoch "
                        "checkpoints); layer names/counters are copied "
                        "from it (utils/keras_export.py)")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from ugaitnet_tpu.core.runtime import setup_compilation_cache
    setup_compilation_cache()
    from ugaitnet_tpu.cli.evaluate import load_experiment
    from ugaitnet_tpu.eval.export import export_encoder
    from ugaitnet_tpu.eval.serving import SignatureService

    model, state, mcfg, step = load_experiment(args.experdir, args.epoch)
    modalities = tuple(b.modality for b in mcfg.branches)
    if args.keras_h5:
        if not args.keras_template:
            raise SystemExit("--keras-h5 needs --keras-template (an h5 "
                             "saved by the reference build — its layer "
                             "names carry process-global counters we "
                             "cannot synthesize)")
        from ugaitnet_tpu.utils.keras_export import export_keras_weights
        export_keras_weights(state.params, args.keras_h5,
                             args.keras_template)
        print(f"* wrote reference-layout Keras weights -> {args.keras_h5}")
    # models trained with --normstats persist their standardization; bake
    # it into the artifact or the served net sees inputs on the wrong
    # scale (same rule as cli/evaluate.py)
    from ugaitnet_tpu.data.pipeline import load_norm_stats
    norm_stats = load_norm_stats(args.experdir, modalities)
    if norm_stats is not None:
        print("* baking persisted norm_stats.npz standardization into "
              "the artifact")
    svc = SignatureService(model, state.params, modalities,
                           typecode=args.typecode, knn=args.knn,
                           buckets=tuple(args.buckets), ntype=args.ntype,
                           norm_stats=norm_stats)
    sizes = export_encoder(svc, args.out, buckets=tuple(args.buckets))
    for b, n in sorted(sizes.items()):
        print(f"bucket {b:4d}: {n/1e6:.1f} MB")
    print(f"exported epoch {step} -> {args.out}")
    if args.warmup:
        import time
        from ugaitnet_tpu.eval.export import ExportedEncoder
        t0 = time.perf_counter()
        ExportedEncoder(args.out, warmup=True)
        print(f"warmed {len(args.buckets)} buckets in "
              f"{time.perf_counter() - t0:.1f}s")


if __name__ == "__main__":
    main()
