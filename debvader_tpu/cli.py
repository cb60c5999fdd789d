"""Command-line entry points: ``python -m debvader_tpu <command>``.

The reference ships no CLI (SURVEY.md §5 config row: configuration is
function kwargs only); a production framework needs runnable entry points
for the standard tasks, so this maps the public API onto argparse
subcommands with the reference's defaults:

- ``deblend``          stamps .npy -> mean (and optional stddev) .npy
- ``detect``           field .npy -> (N, 2) center offsets .npy
- ``serve``            field .npy [+ centers] -> catalog .csv + residual .npy
- ``train``            two-stage transfer training on (blended, isolated) .npy
- ``quantize``         calibrate (+ optional QAT) an int8 serving bundle
- ``export``           weights -> jax.export StableHLO artifact
- ``import-weights``   reference TF checkpoint -> native weights dir

Every command accepts ``--weights`` as either a survey name resolved from
the packaged data ('sim_demo'; 'dc2' once the full reference checkpoint is
materialized) or a directory written by ``train``/``save_weights``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

__all__ = ["main"]


def _model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--stamp-size", type=int, default=59)
    p.add_argument("--bands", type=int, default=6)
    p.add_argument("--latent", type=int, default=32)
    p.add_argument(
        "--filters", type=int, nargs="+", default=[32, 64, 128, 256]
    )
    p.add_argument(
        "--dtype", default="float32", choices=["float32", "bfloat16"],
        help="compute dtype for the forward (bfloat16 for serving throughput)",
    )
    p.add_argument(
        "--f32-stages", type=int, default=0, metavar="N",
        help="run the decoder's last N stage-pairs (+ band conv) in float32 "
        "under a bfloat16 forward.  NOTE: with converged weights the bf16 "
        "rounding error is distributed network-wide (~2.5e-3 mean flux rel "
        "err) and this flag no longer isolates it; the <=1e-4-compliant "
        "serving mode is --matmul-precision highest (BASELINE.md round-3 "
        "notes — --dtype float32 alone still rounds MXU inputs to bf16)",
    )
    p.add_argument(
        "--matmul-precision", default=None,
        choices=["default", "high", "highest"],
        help="MXU pass count for float32 matmuls/convs.  On TPU the default "
        "rounds fp32 matmul inputs to bfloat16 (one pass, measured 6.7e-3 "
        "max flux err vs true fp32); 'high' is 3 passes (1.85e-4 raw, "
        "6.0e-5 with --flux-calibration — the fidelity serving mode), "
        "'highest' 6 passes (1.1e-6) — scripts/bench_precision.py measures "
        "the ladder",
    )
    p.add_argument(
        "--flux-calibration", action="store_true",
        help="measure and divide out the forward's systematic per-band "
        "flux gain vs its own HIGHEST-precision forward (one-time "
        "~128-stamp cost at load; utils/flux_cal.py).  With "
        "--matmul-precision high this is the <=1e-4 fidelity serving "
        "mode at ~1.8x the throughput of 'highest'",
    )


def _load_net(args):
    from debvader_tpu.training.checkpoint import (
        load_deblender,
        load_weights_from,
    )

    shape = (args.stamp_size, args.stamp_size, args.bands)
    kernels = (3,) * len(args.filters)
    flux_cal = getattr(args, "flux_calibration", False)
    if args.weights and Path(args.weights).exists():
        from debvader_tpu.config import ModelConfig
        from debvader_tpu.models.vae import DeblenderVAE

        model = DeblenderVAE(
            ModelConfig(
                stamp_size=args.stamp_size,
                nb_of_bands=args.bands,
                latent_dim=args.latent,
                filters=tuple(args.filters),
                kernels=kernels,
                dtype=args.dtype,
                decoder_f32_stages=args.f32_stages,
                matmul_precision=args.matmul_precision,
            )
        )
        variables = load_weights_from(args.weights)
        if flux_cal:
            from debvader_tpu.utils.flux_cal import attach_flux_calibration

            variables = attach_flux_calibration(model, variables)
        return model, variables
    return load_deblender(
        args.weights or "sim_demo",
        input_shape=shape,
        latent_dim=args.latent,
        filters=tuple(args.filters),
        kernels=kernels,
        dtype=args.dtype,
        decoder_f32_stages=args.f32_stages,
        matmul_precision=args.matmul_precision,
        flux_calibration=flux_cal,
    )


def _load_field(path: str) -> np.ndarray:
    field = np.load(path)
    if field.ndim == 3:
        field = field[None]
    return field.astype(np.float32)


def _det_cfg(args):
    from debvader_tpu.config import DetectionConfig

    kw = {}
    if args.thresh is not None:
        kw["thresh"] = args.thresh
    if getattr(args, "detection_band", None) is not None:
        kw["detection_band"] = args.detection_band
    if getattr(args, "deblend_algo", None) is not None:
        kw["deblend_algo"] = args.deblend_algo
    return DetectionConfig(**kw)


def _cmd_deblend(args) -> int:
    from debvader_tpu.api import deblend

    stamps = np.load(args.stamps)
    if stamps.ndim == 3:
        stamps = stamps[None]
    if getattr(args, "artifact", None):
        import jax

        from debvader_tpu.api import padded_forward
        from debvader_tpu.utils.export import artifact_forward

        fwd = artifact_forward(args.artifact, normalise=args.normalise)
        dist = padded_forward(fwd, stamps, jax.random.PRNGKey(0))
        means = np.asarray(dist.mean())
    else:
        net = _load_net(args)
        means, dist = deblend(net, stamps, normalise=args.normalise)
    np.save(args.out, means)
    print(f"wrote {args.out}: {means.shape}")
    if args.std:
        std = np.asarray(dist.stddev())
        np.save(args.std, std)
        print(f"wrote {args.std}: {std.shape}")
    return 0


def _cmd_detect(args) -> int:
    from debvader_tpu.pipeline.tiles import detect_objects_tiled

    field = _load_field(args.field)
    centers = detect_objects_tiled(
        field, _det_cfg(args), tile=args.tile, overlap=args.overlap
    )
    np.save(args.out, centers)
    print(f"wrote {args.out}: {len(centers)} detections")
    return 0


def _cmd_serve(args) -> int:
    from debvader_tpu.config import PipelineConfig

    net = _load_net(args)
    field = _load_field(args.field)

    quantized = None
    if getattr(args, "quantized", None):
        from debvader_tpu.models.quantized import load_quantized

        quantized = load_quantized(args.quantized)
    kw = dict(
        cutout_size=args.stamp_size,
        nb_of_bands=args.bands,
        normalise=args.normalise,
        artifact=getattr(args, "artifact", None),
        quantized=quantized,
        # thread --tile/--overlap into the pipeline config so the
        # ITERATIVE path's internal detection honors them too
        cfg=PipelineConfig(
            cutout_size=args.stamp_size,
            nb_of_bands=args.bands,
            tile_size=args.tile,
            tile_overlap=args.overlap,
        ),
    )
    timings: dict = {}
    if args.iterative:
        from debvader_tpu.pipeline.iterative import IterativeDeblendField

        df = IterativeDeblendField(net, field, **kw)
        catalog, residual = df.iterative_deblend_and_render(
            _load_centers(args),
            optimise_positions=args.optimise_positions,
            measure=args.measure,
            det_cfg=_det_cfg(args),
            transfer_dtype=args.transfer_dtype,
        )
    else:
        from debvader_tpu.pipeline.field import DeblendField
        from debvader_tpu.pipeline.tiles import detect_objects_tiled

        centers = _load_centers(args)
        if centers is None:
            centers = detect_objects_tiled(
                field, _det_cfg(args), tile=args.tile, overlap=args.overlap
            )
            print(f"detected {len(centers)} sources")
        df = DeblendField(net, field, **kw)
        catalog, residual = df.deblend_and_render(
            centers,
            optimise_positions=args.optimise_positions,
            measure=args.measure,
            timings=timings,
            transfer_dtype=args.transfer_dtype,
        )
    if catalog is None:
        print("no sources deblended")
        return 1
    np.save(f"{args.out_prefix}_residual.npy", residual)
    _write_catalog(catalog, f"{args.out_prefix}_catalog.csv")
    print(
        f"wrote {args.out_prefix}_catalog.csv ({len(catalog)} rows) and "
        f"{args.out_prefix}_residual.npy"
        + (
            "  stages: "
            + " ".join(f"{k}={v:.2f}s" for k, v in timings.items())
            if timings
            else ""
        )
    )
    return 0


def _load_centers(args):
    return np.load(args.centers) if args.centers else None


def _write_catalog(catalog, path: str) -> None:
    import pandas as pd

    df = pd.DataFrame.from_records(catalog)
    # vector columns (shifts, centroid, ...) -> one column per component
    for col in list(df.columns):
        first = df[col].iloc[0] if len(df) else None
        if isinstance(first, np.ndarray) and first.ndim >= 1:
            arr = np.stack(list(df[col]))
            flat = arr.reshape(len(df), -1)
            for i in range(flat.shape[1]):
                df[f"{col}_{i}"] = flat[:, i]
            del df[col]
    df.to_csv(path, index=False)


def _cmd_train(args) -> int:
    from debvader_tpu.config import ModelConfig
    from debvader_tpu.training.checkpoint import save_weights
    from debvader_tpu.training.train import train_deblender

    model_cfg = ModelConfig(
        stamp_size=args.stamp_size,
        nb_of_bands=args.bands,
        latent_dim=args.latent,
        filters=tuple(args.filters),
        kernels=(3,) * len(args.filters),
        dtype=args.dtype,
    )

    x = np.load(args.blended).astype(np.float32)
    y = np.load(args.isolated).astype(np.float32)
    n_val = max(int(len(x) * args.val_fraction), 1)
    mesh = None
    if args.mesh:
        from debvader_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)
    hist_vae, hist_debl, state, _model = train_deblender(
        args.survey,
        args.from_survey,
        args.epochs,
        steps_per_dispatch=args.steps_per_dispatch,
        training_data_vae=(x[n_val:], y[n_val:]),
        validation_data_vae=(x[:n_val], y[:n_val]),
        training_data_deblender=(x[n_val:], y[n_val:]),
        validation_data_deblender=(x[:n_val], y[:n_val]),
        batch_size=args.batch_size,
        nb_of_bands=args.bands,
        verbose=1,
        mesh=mesh,
        metrics_log=args.metrics_log,
        model_cfg=model_cfg,
    )
    save_weights(
        args.out, {"params": state.params, "batch_stats": state.batch_stats}
    )
    print(
        f"wrote {args.out}  (final val loss: "
        f"vae={hist_vae['val_loss'][-1]:.4g} "
        f"deblender={hist_debl['val_loss'][-1]:.4g})"
    )
    return 0


def _cmd_quantize(args) -> int:
    """Calibrate (and optionally QAT-fine-tune) an int8 serving bundle."""
    import jax

    from debvader_tpu.data.simulate import simulate_batch
    from debvader_tpu.models.quantized import (
        qat_finetune,
        quantize_vae,
        save_quantized,
    )

    model, variables = _load_net(args)
    if args.calib_stamps:
        calib = np.load(args.calib_stamps).astype(np.float32)
    else:
        cfg = model.cfg
        calib, _, _ = simulate_batch(
            jax.random.PRNGKey(11), args.calib_n,
            stamp=cfg.stamp_size, bands=cfg.nb_of_bands,
        )
    qv = quantize_vae(
        model, variables, calib, normalise=args.normalise,
        act_granularity=args.act_granularity,
    )
    if args.qat_steps:
        qv = qat_finetune(
            qv, steps=args.qat_steps, batch=args.qat_batch,
            learning_rate=args.qat_lr, teacher_variables=qv.variables,
        )
    save_quantized(qv, args.out)
    print(
        f"wrote {args.out} (int8 bundle, {len(qv.qweights)} quantized "
        f"layers{', QAT ' + str(args.qat_steps) + ' steps' if args.qat_steps else ''})"
    )
    return 0


def _cmd_export(args) -> int:
    from debvader_tpu.utils.export import export_deblender

    model, variables = _load_net(args)
    blob = export_deblender(
        model, variables, batch_size=args.batch or None, path=args.out
    )
    print(f"wrote {args.out} ({len(blob)} bytes of StableHLO)")
    return 0


def _cmd_import_weights(args) -> int:
    from debvader_tpu.training.checkpoint import save_weights
    from debvader_tpu.utils.weight_import import import_reference_checkpoint

    variables = import_reference_checkpoint(args.ckpt, strict=not args.partial)
    save_weights(args.out, variables)
    print(f"wrote {args.out}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="debvader_tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    from debvader_tpu import __version__

    parser.add_argument(
        "--version", action="version", version=f"debvader_tpu {__version__}"
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("deblend", help="batched stamp deblending")
    _model_flags(p)
    p.add_argument("--weights", help="survey name or weights dir (default sim_demo)")
    p.add_argument(
        "--artifact",
        help="serve from a jax.export StableHLO artifact (see `export`) "
        "instead of loading weights — cold start skips tracing/lowering",
    )
    p.add_argument("--stamps", required=True, help="(N, S, S, B) .npy")
    p.add_argument("--out", required=True, help="output means .npy")
    p.add_argument("--std", help="also write the per-pixel stddev .npy")
    p.add_argument("--normalise", action="store_true")
    p.set_defaults(fn=_cmd_deblend)

    p = sub.add_parser("detect", help="tiled source detection")
    p.add_argument("--field", required=True, help="(F, F, B) or (1,F,F,B) .npy")
    p.add_argument("--out", required=True, help="output centers .npy")
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--overlap", type=int, default=64)
    p.add_argument("--thresh", type=float, default=None)
    p.add_argument("--detection-band", type=int, default=None)
    p.add_argument(
        "--deblend-algo", default=None, choices=["watershed", "lutz"],
        help="island-splitting algorithm: watershed+quantized-merge "
        "(default) or the sep-faithful Lutz multi-threshold tree "
        "(native, opt-in; PARITY.md)",
    )
    p.set_defaults(fn=_cmd_detect)

    p = sub.add_parser(
        "serve", help="catalog + residual serving (detects when no centers given)"
    )
    _model_flags(p)
    p.add_argument("--weights")
    p.add_argument(
        "--artifact",
        help="run the batched stamp forward from a jax.export artifact "
        "(weights still load for epistemic sampling, if enabled)",
    )
    p.add_argument(
        "--quantized",
        help="int8 serving bundle dir from the `quantize` command — the "
        "batched stamp forward runs the s8xs8->s32 MXU path (1.25x bf16; "
        "accuracy envelope per the bundle's calibration/QAT, BASELINE.md)",
    )
    p.add_argument("--field", required=True)
    p.add_argument("--centers", help="(N, 2) offsets .npy; omit to detect")
    p.add_argument("--out-prefix", required=True)
    p.add_argument("--iterative", action="store_true")
    p.add_argument("--optimise-positions", action="store_true")
    p.add_argument("--measure", action="store_true")
    p.add_argument("--normalise", action="store_true")
    p.add_argument("--transfer-dtype", choices=["bfloat16", "float16"])
    p.add_argument("--tile", type=int, default=1024)
    p.add_argument("--overlap", type=int, default=64)
    p.add_argument("--thresh", type=float, default=None)
    p.add_argument("--detection-band", type=int, default=None)
    p.add_argument(
        "--deblend-algo", default=None, choices=["watershed", "lutz"],
        help="island-splitting algorithm (see `detect --deblend-algo`)",
    )
    p.set_defaults(fn=_cmd_serve)

    p = sub.add_parser("train", help="two-stage transfer training")
    _model_flags(p)
    p.add_argument("--blended", required=True, help="(N, S, S, B) inputs .npy")
    p.add_argument("--isolated", required=True, help="(N, S, S, B) targets .npy")
    p.add_argument("--out", required=True, help="output weights dir")
    p.add_argument("--survey", default="lsst")
    p.add_argument(
        "--from-survey", default=None,
        help="warm-start from this survey's weights (cross-band OK)",
    )
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch-size", type=int, default=5)
    p.add_argument("--val-fraction", type=float, default=0.1)
    p.add_argument("--mesh", type=int, help="data-parallel over N devices")
    p.add_argument("--metrics-log", help="JSONL epoch metrics path")
    p.add_argument(
        "--steps-per-dispatch", type=int, default=1,
        help="scan K full batches per device dispatch (host-data training "
        "throughput lever; datasets that fit HBM stay resident — "
        "BASELINE.md r4)",
    )
    p.set_defaults(fn=_cmd_train)

    p = sub.add_parser(
        "quantize",
        help="calibrate (+ optional QAT fine-tune) an int8 serving bundle",
    )
    _model_flags(p)
    p.add_argument("--weights")
    p.add_argument("--out", required=True, help="output bundle dir")
    p.add_argument(
        "--calib-stamps",
        help="(N, S, S, B) .npy of representative stamps; default: "
        "simulated batch",
    )
    p.add_argument("--calib-n", type=int, default=128)
    p.add_argument(
        "--qat-steps", type=int, default=0,
        help="straight-through-estimator self-distillation steps (500-1000 "
        "takes int8 flux divergence 0.23 -> ~0.025 on converged weights; "
        "BASELINE.md r4)",
    )
    p.add_argument("--qat-batch", type=int, default=256)
    p.add_argument("--qat-lr", type=float, default=1e-4)
    p.add_argument(
        "--act-granularity", default="per_channel",
        choices=["per_channel", "per_tensor"],
        help="activation-scale granularity; per_channel (default) folds "
        "per-input-channel scales into the weight grid at identical "
        "runtime cost and measures ~3x better PTQ / 1.6x better QAT flux "
        "accuracy than per_tensor (BASELINE.md r5)",
    )
    p.add_argument("--normalise", action="store_true")
    p.set_defaults(fn=_cmd_quantize)

    p = sub.add_parser("export", help="StableHLO serving artifact")
    _model_flags(p)
    p.add_argument("--weights")
    p.add_argument("--out", required=True)
    p.add_argument(
        "--batch", type=int, default=0,
        help="0 (default) = symbolic batch dimension: one artifact serves "
        "any batch size (what `serve --artifact` needs)",
    )
    p.set_defaults(fn=_cmd_export)

    p = sub.add_parser(
        "import-weights", help="reference TF checkpoint -> native weights"
    )
    p.add_argument("--ckpt", required=True, help="TF checkpoint prefix")
    p.add_argument("--out", required=True, help="output weights dir")
    p.add_argument(
        "--partial", action="store_true",
        help="tolerate missing tensors (e.g. a stripped checkpoint shard)",
    )
    p.set_defaults(fn=_cmd_import_weights)

    return parser


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    # Persistent compilation cache: the measured cold-start lever
    # (BASELINE.md r4: serve cold start 20.4 -> 11.5 s on repeat
    # processes).  Best-effort; opt out with DEBVADER_NO_COMPILE_CACHE=1.
    import os

    if not os.environ.get("DEBVADER_NO_COMPILE_CACHE"):
        from debvader_tpu.utils.compile_cache import enable_compilation_cache

        enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
