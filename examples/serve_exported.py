"""Standalone serving demo: run an exported generator with no model code.

The reference's deployment story is keras SavedModel save/load inside the
same codebase (side2side_model.py:178-200). The TPU-native equivalent is a
`jax.export` program (models/export.py): weights + StableHLO in one blob a
serving process can execute with nothing but jax installed — which this
script demonstrates by using ONLY `load_exported` at serving time.

Two phases:

    # export a generator program (fresh init, or --checkpoint to restore
    # the latest orbax checkpoint first)
    python examples/serve_exported.py export --model baseline-no-aug \
        --batch-size 16 --out program.bin

    # serve a folder of RGBA PNGs through the exported program
    python examples/serve_exported.py serve --program program.bin \
        --input-dir /root/reference/datasets/rpg-maker-xp/test/2-front \
        --output-dir generated/

Serving pads the final partial batch to the exported batch size (exported
programs are fixed-shape) and slices the padding back off.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def do_export(args) -> None:
    import jax

    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.models import export as export_mod
    from palette_and_histo_gan_tpu.train.state import build_models, create_train_state

    config = config_for_variant(
        args.model, batch_size=args.batch_size, donate_state=False
    )
    models = build_models(config)
    if args.checkpoint:
        # the Trainer builds its own state before restoring; don't pay a
        # second full-width init just to throw it away
        from palette_and_histo_gan_tpu.train.trainer import Trainer

        trainer = Trainer(config)
        trainer.restore_latest_checkpoint()
        g_params = trainer.state.g_params
    else:
        state = create_train_state(config, models, jax.random.PRNGKey(config.seed))
        g_params = state.g_params
    blob = export_mod.export_generator_serialized(
        config, models, g_params, batch_size=args.batch_size
    )
    with open(args.out, "wb") as f:
        f.write(blob)
    print(f"exported {args.model} generator ({len(blob)} bytes) -> {args.out}")


def do_serve(args) -> None:
    # serving needs no model code: just the program blob + jax
    import jax
    import numpy as np
    from PIL import Image

    with open(args.program, "rb") as f:
        exported = jax.export.deserialize(f.read())
    infer = exported.call
    in_shape = exported.in_avals[0].shape
    batch = in_shape[0]
    if in_shape[-1] != 4:
        raise SystemExit(
            f"program expects {in_shape[-1]}-channel input, not RGBA: this "
            "demo serves RGBA-variant generators only (an indexed-variant "
            "program consumes palette-index maps and emits 256-way "
            "probabilities, which need per-image palettes to decode — see "
            "train/steps.py::generate_core for that path)"
        )
    names = sorted(
        f for f in os.listdir(args.input_dir) if f.lower().endswith(".png")
    )
    if not names:
        raise SystemExit(f"no PNGs in {args.input_dir}")
    imgs = np.stack(
        [
            np.asarray(
                Image.open(os.path.join(args.input_dir, f)).convert("RGBA"),
                dtype=np.uint8,
            )
            for f in names
        ]
    )
    source = imgs.astype(np.float32) / 127.5 - 1.0  # dataset_utils.py:39-48

    # exported programs are fixed-shape (batch from the program's input
    # spec); pad the tail batch and slice the padding back off
    os.makedirs(args.output_dir, exist_ok=True)
    for lo in range(0, len(source), batch):
        chunk = source[lo : lo + batch]
        n_real = len(chunk)
        if n_real < batch:
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[:1], batch - n_real, 0)], axis=0
            )
        fake = np.asarray(infer(chunk))[:n_real]
        fake_u8 = ((fake + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        for j, img in enumerate(fake_u8):
            Image.fromarray(img, mode="RGBA").save(
                os.path.join(args.output_dir, names[lo + j])
            )
    print(f"served {len(names)} images -> {args.output_dir}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pe = sub.add_parser("export")
    pe.add_argument("--model", default="baseline-no-aug")
    pe.add_argument("--batch-size", type=int, default=16)
    pe.add_argument("--checkpoint", action="store_true")
    pe.add_argument("--out", default="program.bin")
    ps = sub.add_parser("serve")
    ps.add_argument("--program", required=True)
    ps.add_argument("--input-dir", required=True)
    ps.add_argument("--output-dir", default="generated")
    args = p.parse_args()
    if args.cmd == "export":
        do_export(args)
    else:
        do_serve(args)


if __name__ == "__main__":
    main()
