"""Convert reference-trained keras network weights into Flax param trees.

The reference saves trained networks as TF-2.9 keras SavedModels
(/root/reference/side2side_model.py:178-200). keras 3 (this environment)
cannot read those, so the export happens in the ORIGINAL TF 2.9 + tfa
environment first — a 4-line snippet there produces a portable .npz:

    import numpy as np, tensorflow as tf
    import tensorflow_addons  # registers InstanceNormalization
    m = tf.keras.models.load_model(
        "models/py/generator/front-to-right/baseline", compile=False)
    np.savez("generator.npz", *m.get_weights())

Then here:

    python scripts/convert_reference_weights.py \
        --generator generator.npz --variant baseline --out-dir converted/

writes converted/generator_flax.npz ('/'-joined Flax param keys; load with
palette_and_histo_gan_tpu.models.convert.load_params_npz) and verifies the
tree initializes the production UnetGenerator. Same for --discriminator.

Use the converted generator directly:

    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.models import build_generator
    from palette_and_histo_gan_tpu.models.convert import load_params_npz
    cfg = config_for_variant("baseline")
    gen = build_generator(cfg)
    params = {"params": load_params_npz("converted/generator_flax.npz")}
    out = gen.apply(params, source_batch, deterministic=True)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from palette_and_histo_gan_tpu.config import MODEL_VARIANTS, config_for_variant
from palette_and_histo_gan_tpu.models import convert


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--generator", help=".npz of generator get_weights()")
    ap.add_argument(
        "--discriminator", help=".npz of discriminator get_weights()"
    )
    ap.add_argument(
        "--variant",
        default="baseline",
        choices=MODEL_VARIANTS,
        help="trained variant; sets the channel counts (indexed: 1->256)",
    )
    ap.add_argument("--out-dir", default="converted")
    ap.add_argument(
        "--verify",
        action="store_true",
        help="also run one forward pass through the Flax nets (slow: "
        "compiles; shape/param-count checks always run)",
    )
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="force the CPU backend for --verify (conversion itself is "
        "pure numpy; the forward check does not need an accelerator)",
    )
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if not args.generator and not args.discriminator:
        ap.error("give --generator and/or --discriminator")

    cfg = config_for_variant(args.variant)
    os.makedirs(args.out_dir, exist_ok=True)

    if args.generator:
        arrays = convert.load_keras_npz(args.generator)
        tree = convert.keras_generator_weights_to_flax(
            arrays, cfg.generator_in_channels, cfg.generator_out_channels
        )
        n = sum(a.size for a in arrays)
        out = os.path.join(args.out_dir, "generator_flax.npz")
        convert.save_params_npz(out, tree)
        print(f"generator: {len(arrays)} arrays, {n:,} params -> {out}")
        if args.verify:
            _verify_generator(cfg, tree)

    if args.discriminator:
        arrays = convert.load_keras_npz(args.discriminator)
        tree = convert.keras_discriminator_weights_to_flax(
            arrays, cfg.discriminator_in_channels
        )
        n = sum(a.size for a in arrays)
        out = os.path.join(args.out_dir, "discriminator_flax.npz")
        convert.save_params_npz(out, tree)
        print(f"discriminator: {len(arrays)} arrays, {n:,} params -> {out}")
        if args.verify:
            _verify_discriminator(cfg, tree)

    return 0


def _verify_generator(cfg, tree) -> None:
    import jax
    import jax.numpy as jnp

    from palette_and_histo_gan_tpu.models import build_generator

    gen = build_generator(cfg)
    x = jnp.zeros((1, 64, 64, cfg.generator_in_channels), jnp.float32)
    out = gen.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, tree)},
        x,
        deterministic=True,
    )
    print(
        f"verify: forward ok, output {tuple(out.shape)} "
        f"finite={bool(np.isfinite(np.asarray(out)).all())}"
    )


def _verify_discriminator(cfg, tree) -> None:
    import jax
    import jax.numpy as jnp

    from palette_and_histo_gan_tpu.models import build_discriminator

    disc = build_discriminator(cfg)
    c = cfg.discriminator_in_channels
    target = jnp.zeros((1, 64, 64, c), jnp.float32)
    source = jnp.zeros((1, 64, 64, c), jnp.float32)
    out = disc.apply(
        {"params": jax.tree_util.tree_map(jnp.asarray, tree)}, target, source
    )
    print(
        f"verify: discriminator forward ok, output {tuple(out.shape)} "
        f"finite={bool(np.isfinite(np.asarray(out)).all())}"
    )


if __name__ == "__main__":
    raise SystemExit(main())
