"""Command-line experiment driver.

The reference's only entry point is a notebook (experiments.ipynb); this CLI
exposes the same knobs (model variant, directions, palette ordering, lambdas,
epochs, callbacks — cells 5, 9, 10, 12) as flags, plus TPU-specific ones.

    python -m palette_and_histo_gan_tpu.cli --model histogram \
        --source front --target right --epochs 160 \
        --callbacks evaluate_l1 evaluate_fid
"""

from __future__ import annotations

import argparse

from .config import DIRECTIONS, MODEL_VARIANTS, PALETTE_ORDERINGS, config_for_variant


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="phg-train",
        description="TPU-native palette-and-histo-gan trainer",
    )
    p.add_argument("--model", choices=MODEL_VARIANTS, default="baseline-no-aug")
    p.add_argument("--source", choices=DIRECTIONS, default="front")
    p.add_argument("--target", choices=DIRECTIONS, default="right")
    p.add_argument("--palette-ordering", choices=PALETTE_ORDERINGS, default="grayness")
    p.add_argument("--lambda-l1", type=float, default=None)
    p.add_argument("--lambda-histogram", type=float, default=None)
    p.add_argument("--lambda-segmentation", type=float, default=None)
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument("--steps", type=int, default=None, help="override epoch-derived steps")
    p.add_argument("--update-steps", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--seed", type=int, default=47)
    p.add_argument("--data-root", type=str, default=None)
    p.add_argument(
        "--data-roots",
        type=str,
        nargs="+",
        default=None,
        help="multiple dataset roots, concatenated in global-index order "
        "(reference DATA_FOLDERS, configuration.py:6)",
    )
    p.add_argument(
        "--dataset-sizes",
        type=int,
        nargs="+",
        default=None,
        help="per-root dataset sizes (reference DATASET_SIZES); "
        "train/test split is ceil(0.85*n) per root",
    )
    p.add_argument("--compute-dtype", choices=["float32", "bfloat16"], default="float32")
    p.add_argument(
        "--down-filters", type=int, nargs=6, default=None,
        help="encoder widths override (6 ints; default 64 128 256 512 512 512)",
    )
    p.add_argument(
        "--up-filters", type=int, nargs=6, default=None,
        help="decoder widths override (6 ints; default 512 512 256 128 64 32)",
    )
    p.add_argument(
        "--data-parallel", choices=["auto", "on", "off"], default="auto",
        help="shard the batch over all visible devices (parallel/dp.py)",
    )
    p.add_argument(
        "--callbacks",
        nargs="*",
        default=[],
        choices=["show_discriminator_output", "evaluate_l1", "evaluate_fid"],
    )
    p.add_argument("--resume", action="store_true", help="restore latest checkpoint")
    p.add_argument(
        "--init-generator",
        type=str,
        default=None,
        metavar="NPZ",
        help="start from converted reference generator weights "
        "(scripts/convert_reference_weights.py output); not with --resume",
    )
    p.add_argument(
        "--init-discriminator",
        type=str,
        default=None,
        metavar="NPZ",
        help="start from converted reference discriminator weights",
    )
    p.add_argument("--save-weights", action="store_true")
    p.add_argument("--generate-images", action="store_true")
    return p


def config_from_args(args) -> "Config":
    overrides = dict(
        source_direction=DIRECTIONS.index(args.source),
        target_direction=DIRECTIONS.index(args.target),
        palette_ordering=args.palette_ordering,
        epochs=args.epochs,
        batch_size=args.batch_size,
        seed=args.seed,
        compute_dtype=args.compute_dtype,
        data_parallel=args.data_parallel,
    )
    if args.down_filters is not None:
        overrides["down_filters"] = tuple(args.down_filters)
    if args.up_filters is not None:
        overrides["up_filters"] = tuple(args.up_filters)
    if args.lambda_l1 is not None:
        overrides["lambda_l1"] = args.lambda_l1
    if args.lambda_histogram is not None:
        overrides["lambda_histogram"] = args.lambda_histogram
    if args.lambda_segmentation is not None:
        overrides["lambda_segmentation"] = args.lambda_segmentation
    if args.data_root is not None:
        overrides["data_root"] = args.data_root
    if args.data_roots is not None:
        overrides["data_roots"] = tuple(args.data_roots)
        sizes = args.dataset_sizes
        if sizes is None and len(args.data_roots) != 1:
            raise SystemExit(
                f"--data-roots got {len(args.data_roots)} roots but "
                "--dataset-sizes was not given; pass one size per root"
            )
        if sizes is not None and len(sizes) != len(args.data_roots):
            raise SystemExit(
                f"--data-roots ({len(args.data_roots)}) and --dataset-sizes "
                f"({len(sizes)}) must have the same length"
            )
    if args.dataset_sizes is not None:
        overrides["dataset_sizes"] = tuple(args.dataset_sizes)
    return config_for_variant(args.model, **overrides)


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    config = config_from_args(args)

    from .train.trainer import Trainer

    if args.resume and (args.init_generator or args.init_discriminator):
        raise SystemExit(
            "--resume and --init-generator/--init-discriminator are mutually "
            "exclusive (a checkpoint restore would overwrite the import)"
        )

    trainer = Trainer(config)
    starting_step = 0
    if args.resume:
        starting_step = trainer.restore_latest_checkpoint()
        print(f"Resumed from step {starting_step}")
    if args.init_generator or args.init_discriminator:
        trainer.import_network_params(args.init_generator, args.init_discriminator)
        print("Imported converted reference weights")

    steps = args.steps if args.steps is not None else config.steps
    update_steps = (
        args.update_steps if args.update_steps is not None else config.update_steps
    )
    print(
        f"Starting training for {config.model} ({config.architecture_name}): "
        f"{steps} steps, updating every {update_steps}..."
    )
    trainer.fit(
        steps - starting_step,
        update_steps,
        callbacks=list(args.callbacks),
        starting_step=starting_step,
    )

    if args.save_weights:
        trainer.save_generator()
        trainer.save_discriminator()
    if args.generate_images:
        trainer.generate_images_from_dataset("test")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
