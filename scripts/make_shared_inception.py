"""Create the SHARED InceptionV3 feature weights both frameworks use for
the cross-framework FID anchor.

The reference computes FID with the pretrained keras InceptionV3 singleton
(/root/reference/frechet_inception_distance.py:76). This environment has no
network egress, so the pretrained file cannot exist here — but FID
*comparability across frameworks* only requires that both sides use the
SAME feature extractor, whatever its weights. This script builds a
deterministically-seeded random-init keras InceptionV3 (notop, avg-pool,
the reference's exact constructor call) and writes BOTH consumable forms:

  artifacts/inception_shared.weights.h5  — keras-native, loaded by the
      TF side of the measured training anchor (scripts/reference_train_tf.py)
  artifacts/inception_shared.npz         — converted via
      models/inception.py::convert_keras_model, consumed by the build via
      PHG_INCEPTION_WEIGHTS (scripts/compare_reference_train.py)

The h5->npz conversion is feature-parity-tested with randomized weights in
tests/test_fid.py, so the two files define one extractor. With the real
pretrained .h5 in hand, the same flow (scripts/convert_inception.py)
reproduces paper-comparable FIDs; this script's artifact makes the
cross-framework FID *anchor* runnable today.

Run once from the repo root:
  python scripts/make_shared_inception.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ART = os.path.join(os.path.dirname(__file__), "..", "artifacts")
H5 = os.path.join(ART, "inception_shared.weights.h5")
NPZ = os.path.join(ART, "inception_shared.npz")


def main() -> int:
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
    import numpy as np
    import tensorflow as tf

    from palette_and_histo_gan_tpu.models.inception import convert_keras_model

    os.makedirs(ART, exist_ok=True)
    tf.keras.utils.set_random_seed(47)  # the reference SEED (configuration.py)
    model = tf.keras.applications.InceptionV3(
        include_top=False, pooling="avg", input_shape=(299, 299, 3), weights=None
    )  # frechet_inception_distance.py:76, minus the unavailable download
    # Keras' default glorot kernels collapse through 94 conv+ReLU stages
    # (each ReLU halves the variance -> features ~2^-47, sample-independent,
    # FID degenerates to ~0; measured on this host). He-normal kernels
    # exactly compensate the ReLU halving, so the random features stay
    # discriminative end to end — a requirement for the FID anchor to test
    # the *generators* rather than a constant function.
    rng = np.random.default_rng(47)
    for layer in model.layers:
        if layer.__class__.__name__ == "Conv2D":
            (kernel,) = layer.get_weights()  # use_bias=False in conv2d_bn
            fan_in = int(np.prod(kernel.shape[:3]))
            layer.set_weights(
                [rng.normal(0.0, np.sqrt(2.0 / fan_in), kernel.shape).astype(
                    np.float32
                )]
            )
    model.save_weights(H5)
    np.savez(NPZ, **convert_keras_model(model))
    print(f"wrote {H5} ({os.path.getsize(H5)/1e6:.1f} MB)")
    print(f"wrote {NPZ} ({os.path.getsize(NPZ)/1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
