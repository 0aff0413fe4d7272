"""Convert keras InceptionV3 weights into the .npz consumed by on-TPU FID.

The reference computes FID with the pretrained keras InceptionV3 singleton
(/root/reference/frechet_inception_distance.py:76). This environment has no
network egress, so pretrained weights can't be fetched here — but the whole
conversion story is one command wherever the weights file exists:

    # with the keras-applications .h5 file on disk:
    python scripts/convert_inception.py \
        --h5 inception_v3_weights_tf_dim_ordering_tf_kernels_notop.h5 \
        --out inception_weights.npz

    # or let keras download them (network required):
    python scripts/convert_inception.py --out inception_weights.npz

    # then point the framework at the result:
    export PHG_INCEPTION_WEIGHTS=/path/to/inception_weights.npz

Every FID the framework reports (Trainer callbacks, FidEvaluator.compare)
picks the file up automatically and becomes numerically comparable to the
TF reference — the full chain equality is proven offline by
tests/test_fid.py::test_fid_chain_composed_vs_reference_formula with
randomized weights, so the pretrained file is the only missing input.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument(
        "--h5",
        default="imagenet",
        help="path to the keras notop .h5 weights file; default lets keras "
        "resolve/download its pretrained 'imagenet' weights",
    )
    p.add_argument("--out", required=True, help="output .npz path")
    args = p.parse_args()

    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    from palette_and_histo_gan_tpu.models.inception import convert_keras_weights

    convert_keras_weights(args.h5, args.out)
    size = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size:.1f} MB)")
    print(f"export PHG_INCEPTION_WEIGHTS={os.path.abspath(args.out)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
