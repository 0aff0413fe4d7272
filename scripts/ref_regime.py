"""The shared measured-baseline training regime (TF reference vs build).

Defines everything BOTH sides of the measured training-quality comparison
must agree on — initial weights, batch order, eval protocol — so the only
difference between scripts/reference_train_tf.py (TF 2.21 running the
reference formulas) and scripts/compare_reference_train.py (the build's
production step path) is the framework under test.

Regime choices, documented for the record:
  - Reference-faithful init: conv kernels N(0, 0.02) (networks.py:7),
    biases/offsets zero, norm scales one — regenerated deterministically
    from canonical names so both frameworks start from identical arrays.
  - Dropout OFF on both sides: the tight-comparability regime the round-3
    verdict asked for (dropout RNG cannot be matched across frameworks;
    with it on, only tolerance bands would be comparable).
  - Batch order: per-epoch permutations of the train split from one
    numpy Generator seeded with the reference SEED (47), drop-remainder
    (62 full batches of 4 per 250-image epoch). The reference's
    tf.data shuffle order itself is not reproducible outside TF's RNG;
    what matters for the comparison is that both sides consume the
    identical sequence of real sprite batches.
  - Eval: L1 on the full 44-image test split (mean |target - G(source)|
    on the [-1, 1] scale), the reference's reported quality metric
    (side2side_model.py::report_l1 / evaluate_l1), with the deterministic
    generator.
"""

import os
import sys

import numpy as np

_repo_root = os.path.join(os.path.dirname(__file__), "..")
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

from tests import parity_utils as pu  # noqa: E402

SEED = 47
BATCH = 4


def reference_init(spec) -> dict:
    """Reference-faithful deterministic init (networks.py:7): convs
    N(0, 0.02) keyed by canonical name, biases/offsets 0, scales 1."""
    out = {}
    for name, shape, kind in spec:
        if kind == "conv":
            out[name] = pu.make_param(name, shape, "conv")
        elif kind in ("bias", "offset"):
            out[name] = np.zeros(shape, np.float32)
        elif kind == "scale":
            out[name] = np.ones(shape, np.float32)
        else:
            raise ValueError(kind)
    return out


def batch_order(n_train: int, steps: int, batch: int = BATCH) -> np.ndarray:
    """(steps, batch) train-split indices: concatenated epoch permutations,
    drop-remainder, from one Generator seeded with the reference SEED."""
    rng = np.random.default_rng(SEED)
    per_epoch = n_train // batch
    order = []
    while len(order) < steps:
        perm = rng.permutation(n_train)
        for k in range(per_epoch):
            order.append(perm[k * batch : (k + 1) * batch])
            if len(order) == steps:
                break
    return np.asarray(order, np.int64)


def load_splits():
    """(train_src, train_tgt, test_src, test_tgt) as raw uint8 arrays for
    the reference's default front -> right pair."""
    from palette_and_histo_gan_tpu.config import (
        DIRECTION_FRONT,
        DIRECTION_RIGHT,
        default_data_root,
    )
    from palette_and_histo_gan_tpu.data.loader import load_split_arrays

    root = default_data_root()
    return (
        load_split_arrays(root, "train", DIRECTION_FRONT),
        load_split_arrays(root, "train", DIRECTION_RIGHT),
        load_split_arrays(root, "test", DIRECTION_FRONT),
        load_split_arrays(root, "test", DIRECTION_RIGHT),
    )


def normalize(u8: np.ndarray) -> np.ndarray:
    """[0, 255] uint8 -> [-1, 1] float32 (dataset_utils.py:39-48)."""
    return u8.astype(np.float32) / 127.5 - 1.0


def load_indexed_splits():
    """((src, tgt, palettes) train, (src, tgt, palettes) test) as numpy,
    via the build's indexed dataset pipeline — the palette extraction is
    itself golden-tested against TF (tests/test_palette.py), so feeding
    BOTH frameworks the same maps isolates the training comparison from
    the data pipeline."""
    from palette_and_histo_gan_tpu.config import config_for_variant
    from palette_and_histo_gan_tpu.data.loader import make_indexed_datasets

    cfg = config_for_variant("indexed")
    train_ds, test_ds = make_indexed_datasets(cfg)

    def host(ds):
        return (
            np.asarray(ds.sources),
            np.asarray(ds.targets),
            np.asarray(ds.palettes),
        )

    return host(train_ds), host(test_ds)


def decode_indexed(idx_maps: np.ndarray, palettes: np.ndarray) -> np.ndarray:
    """(N, 64, 64, 1) index maps -> (N, 64, 64, 4) float32 [0, 255] RGBA
    via per-pair palettes. The reference evaluates indexed L1 on the
    palette-DECODED images (pix2pix_model.py:433-452); out-of-range labels
    (the scatter-sum quirk) are clamped exactly like
    ops/palette.py::indexed_to_rgba, so both frameworks share one eval
    protocol."""
    idx = np.clip(idx_maps[..., 0], 0, palettes.shape[1] - 1)
    return np.stack(
        [palettes[i][idx[i]] for i in range(idx.shape[0])]
    ).astype(np.float32)


FID_STEPS = (2520, 5040, 10080)  # quarter/half/full reference schedule
# (experiments.ipynb cell 10: 160 epochs x 63 steps = 10,080 steps)

SHARED_INCEPTION_H5 = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "inception_shared.weights.h5"
)
SHARED_INCEPTION_NPZ = os.path.join(
    os.path.dirname(__file__), "..", "artifacts", "inception_shared.npz"
)


def fid_preprocess(images: np.ndarray) -> np.ndarray:
    """The reference FID preprocessing chain, in numpy, for [-1, 1] RGBA
    eval images (frechet_inception_distance.py:60-70 with the RGBA quirks
    documented in eval/fid.py): skimage.transform.resize(img, (299,299,3),
    order=0) — nearest-neighbor on H, W AND the channel axis (selecting
    channels [0, 2, 3]) — followed by inception preprocess_input
    (x/127.5 - 1). skimage itself is not installed on this host; the
    coordinate mapping floor((o + 0.5) * in/out) is the one
    eval/fid.py::_nn_indices pins (tests/test_fid.py)."""

    def nn_idx(out_size, in_size):
        o = np.arange(out_size, dtype=np.float64)
        return np.clip(
            np.floor((o + 0.5) * (in_size / out_size)).astype(np.int64),
            0,
            in_size - 1,
        )

    n, h, w, c = images.shape
    iy, ix = nn_idx(299, h), nn_idx(299, w)
    out = images[:, iy][:, :, ix]
    if c != 3:
        out = out[..., nn_idx(3, c)]
    return out.astype(np.float32) / 127.5 - 1.0


def reference_fid_from_acts(act1: np.ndarray, act2: np.ndarray) -> float:
    """The reference FID formula verbatim from activations
    (frechet_inception_distance.py:25-41): numpy.cov (rowvar=False, ddof=1),
    scipy sqrtm with complex truncation."""
    from scipy.linalg import sqrtm

    mu1, sigma1 = act1.mean(axis=0), np.cov(act1, rowvar=False)
    mu2, sigma2 = act2.mean(axis=0), np.cov(act2, rowvar=False)
    ssdiff = np.sum((mu1 - mu2) ** 2.0)
    covmean = sqrtm(sigma1.dot(sigma2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(ssdiff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def parse_fid_at(spec: str):
    """'2520,5040,10080' -> sorted int list; '' -> []."""
    return sorted(int(s) for s in spec.split(",") if s.strip())


def window_means(values, n_windows: int = 5):
    """Mean over equal step windows — the macroscopic trajectory summary
    used for the cross-framework comparison (microscopic trajectories
    decorrelate chaotically; see tests/test_parity.py TIGHT_TOLS note)."""
    values = np.asarray(values, np.float64)
    edges = np.linspace(0, len(values), n_windows + 1).astype(int)
    return [float(values[a:b].mean()) for a, b in zip(edges[:-1], edges[1:])]
