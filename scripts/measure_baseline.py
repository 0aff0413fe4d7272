"""Measured-baseline protocol (BASELINE.md): train the four reference configs
at reference hyperparameters and record L1 / FID for train and test splits.

The reference publishes no numbers (SURVEY.md §6), so these runs establish
the baselines the framework is compared against. FID uses pretrained
InceptionV3 features when PHG_INCEPTION_WEIGHTS points at converted weights;
otherwise a deterministic random-init Inception (values are then only
comparable within/between runs of this framework, which the output records).

Usage:
    python scripts/measure_baseline.py [--epochs 160] [--variants ...]
                                       [--out baseline_results.json]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
# persistent compile cache: four full-size variants = four multi-minute
# remote TPU compiles without it
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

import jax


def run_variant(variant: str, epochs: int, eval_fid: bool, fid_evaluator):
    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.train.trainer import Trainer

    config = config_for_variant(variant, epochs=epochs)
    trainer = Trainer(config, fid_evaluator=fid_evaluator)

    t0 = time.time()
    trainer.fit(callbacks=["evaluate_l1"])
    train_time = time.time() - t0

    l1_train, l1_test = trainer.report_l1()
    result = {
        "variant": variant,
        "architecture": config.architecture_name,
        "steps": config.steps,
        "batch_size": config.batch_size,
        "train_seconds": train_time,
        "steps_per_second": config.steps / train_time,
        "l1_train": l1_train,
        "l1_test": l1_test,
        "phase_seconds": {
            k: round(v, 2) for k, v in trainer.phase_seconds.items()
        },
    }
    if eval_fid:
        fid_train, fid_test = trainer.report_fid()
        result["fid_train"] = fid_train
        result["fid_test"] = fid_test
        result["fid_weights"] = (
            "pretrained"
            if os.environ.get("PHG_INCEPTION_WEIGHTS")
            else "random-init (no pretrained weights available offline)"
        )
    return result


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=160)
    p.add_argument(
        "--variants",
        nargs="*",
        default=["baseline-no-aug", "baseline", "indexed", "histogram"],
    )
    p.add_argument("--no-fid", action="store_true")
    p.add_argument("--out", default="baseline_results.json")
    args = p.parse_args()

    fid_evaluator = None
    if not args.no_fid:
        from palette_and_histo_gan_tpu.config import config_for_variant
        from palette_and_histo_gan_tpu.eval.fid import FidEvaluator

        # mirror Trainer's auto-mesh rule (train/trainer.py:85-92) so the
        # shared evaluator runs the same (sharded or not) FID program the
        # in-training FidEvaluator(mesh=self.mesh) would
        probe = config_for_variant(args.variants[0], epochs=args.epochs)
        ndev = len(jax.devices())
        dp_mode = getattr(probe, "data_parallel", "auto")
        mesh = None
        if dp_mode == "on" or (
            dp_mode == "auto" and ndev > 1 and probe.batch_size % ndev == 0
        ):
            from palette_and_histo_gan_tpu.parallel import mesh as mesh_mod

            mesh = mesh_mod.make_mesh(data_axis=probe.data_axis)
        fid_evaluator = FidEvaluator(mesh=mesh)

    results = []
    for variant in args.variants:
        print(f"=== {variant} ===")
        r = run_variant(variant, args.epochs, not args.no_fid, fid_evaluator)
        print(json.dumps(r, indent=2))
        results.append(r)

    payload = {
        "device": str(jax.devices()[0]),
        "epochs": args.epochs,
        "results": results,
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
