"""End-to-end experiment script mirroring the reference notebook flow.

The reference's only entry point is experiments.ipynb (cells 1-17); this
script is the same experiment as plain Python on the TPU-native stack:
choose a variant -> load the dataset -> build the model -> fit with the
monitoring callbacks -> optionally save weights and dump all test images.

    python examples/run_experiment.py --model histogram
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--model",
        default="baseline-no-aug",
        choices=["baseline-no-aug", "baseline", "indexed", "histogram"],
    )
    p.add_argument("--source", default="front")
    p.add_argument("--target", default="right")
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument("--save-weights", action="store_true")  # cell 12: off by default
    p.add_argument(
        "--generate-all-test-images",
        action=argparse.BooleanOptionalAction,
        default=True,  # cell 16 runs by default; --no-generate-all-test-images opts out
    )
    args = p.parse_args()

    # cell 1: device check
    print(f"JAX devices: {jax.devices()}")

    from palette_and_histo_gan_tpu.config import DIRECTIONS, config_for_variant
    from palette_and_histo_gan_tpu.train.trainer import Trainer

    # cells 3/5/9: seed + model choice + per-variant lambdas
    config = config_for_variant(
        args.model,
        source_direction=DIRECTIONS.index(args.source),
        target_direction=DIRECTIONS.index(args.target),
        epochs=args.epochs,
    )
    print(
        f"Model: {config.model}  architecture: {config.architecture_name}  "
        f"palette ordering: {config.palette_ordering}"
    )

    # cell 7: dataset loading happens inside the Trainer (device-resident)
    trainer = Trainer(config)

    # cell 10: schedule
    print(
        f"Starting training for {config.epochs} epochs in {config.steps} steps, "
        f"updating visualization every {config.update_steps} steps..."
    )

    # cell 12: fit with the three monitoring callbacks
    trainer.fit(
        callbacks=["show_discriminator_output", "evaluate_fid", "evaluate_l1"]
    )

    # cells 14/16: save weights (off by default, like the notebook)
    if args.save_weights:
        trainer.save_generator()
        trainer.save_discriminator()

    # cell 16: generate all test images
    if args.generate_all_test_images:
        trainer.generate_images_from_dataset("test")


if __name__ == "__main__":
    main()
