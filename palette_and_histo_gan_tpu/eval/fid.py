"""Frechet Inception Distance, computed on-TPU.

TPU-native rebuild of /root/reference/frechet_inception_distance.py, which
runs per-image skimage resizes and a CPU scipy sqrtm. Here the whole path —
nearest-neighbor resize, Inception preprocessing, InceptionV3 forward,
mean/covariance, and the matrix square root (Newton-Schulz iteration) — is
jitted XLA. A scipy-based reference path is kept for parity testing.

Faithfully-reproduced reference quirks (flag `reference_quirks=True`,
the default, for FID parity with the TF implementation):
  * RGBA variants pass [-1, 1]-normalized images straight into
    resize + preprocess_input (select_examples_for_evaluation,
    pix2pix_model.py:112-122, never denormalizes), so Inception sees values
    in [-1.008, -0.984] after preprocess_input's x/127.5 - 1.
  * skimage.transform.resize(image, (299, 299, 3), order=0) on a
    (64, 64, 4) array nearest-resamples the *channel axis* too, selecting
    channels [0, 2, 3] = R, B, A.
With `reference_quirks=False`, images are treated sensibly: [-1, 1] RGBA ->
[0, 255] RGB -> resize -> preprocess.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models import inception as inception_mod


# ---------------------------------------------------------------------------
# Resize + preprocess
# ---------------------------------------------------------------------------


def _nn_indices(out_size: int, in_size: int) -> jnp.ndarray:
    """skimage resize(order=0) coordinate mapping: the output pixel center
    (o + 0.5) * in/out - 0.5, rounded half-up == floor((o + 0.5) * in/out)."""
    o = jnp.arange(out_size, dtype=jnp.float32)
    return jnp.clip(
        jnp.floor((o + 0.5) * (in_size / out_size)).astype(jnp.int32),
        0,
        in_size - 1,
    )


def scale_images_nn(
    images: jnp.ndarray, out_hw: int = 299, reference_quirks: bool = True
) -> jnp.ndarray:
    """(N, H, W, C) -> (N, out, out, 3) nearest-neighbor resize.

    With reference_quirks, the channel axis is also nearest-resampled C -> 3
    (skimage treats the trailing dim as just another spatial axis).
    """
    n, h, w, c = images.shape
    iy = _nn_indices(out_hw, h)
    ix = _nn_indices(out_hw, w)
    out = images[:, iy][:, :, ix]
    if c == 3:
        return out
    if reference_quirks:
        ic = _nn_indices(3, c)
        return out[..., ic]
    return out[..., :3]


def preprocess_input(x: jnp.ndarray) -> jnp.ndarray:
    """keras inception_v3.preprocess_input (mode='tf'): x/127.5 - 1."""
    return x / 127.5 - 1.0


# ---------------------------------------------------------------------------
# Matrix square root: Newton-Schulz (TPU-friendly, matmul-only)
# ---------------------------------------------------------------------------


_HI = jax.lax.Precision.HIGHEST  # fp32-accurate matmuls; the default TPU
# precision is bf16-grade, far too coarse for covariance square roots


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def sqrtm_newton_schulz(a: jnp.ndarray, num_iters: int = 25) -> jnp.ndarray:
    """Square root of a PSD matrix via the Newton-Schulz iteration.

    Matmul-only (MXU-friendly), replacing scipy.linalg.sqrtm
    (frechet_inception_distance.py:35). Normalizes by the Frobenius norm for
    convergence; float32 accuracy is parity-tested against scipy.
    """
    dim = a.shape[0]
    norm = jnp.sqrt(jnp.sum(a * a))
    safe_norm = jnp.where(norm < 1e-30, 1.0, norm)
    y = a / safe_norm
    z = jnp.eye(dim, dtype=a.dtype)
    eye3 = 3.0 * jnp.eye(dim, dtype=a.dtype)

    def body(_, carry):
        y, z = carry
        t = 0.5 * (eye3 - _mm(z, y))
        return _mm(y, t), _mm(t, z)

    y, _ = jax.lax.fori_loop(0, num_iters, body, (y, z))
    # a numerically-zero input has a zero square root
    return jnp.where(norm < 1e-30, jnp.zeros_like(a), y * jnp.sqrt(safe_norm))


def _sqrtm_psd_eigh(a: jnp.ndarray) -> jnp.ndarray:
    """PSD matrix square root via eigendecomposition (robust to rank
    deficiency, which FID covariances from n < dim samples always have)."""
    w, v = jnp.linalg.eigh(a)
    w = jnp.sqrt(jnp.clip(w, 0.0, None))
    return _mm(v * w[None, :], v.T)


def trace_sqrt_product(sigma1: jnp.ndarray, sigma2: jnp.ndarray) -> jnp.ndarray:
    """Tr((sigma1 @ sigma2)^(1/2)) via the symmetrized form
    Tr((S sigma2 S)^(1/2)) with S = sqrtm(sigma1), keeping everything
    symmetric PSD.

    FID covariances from few samples are singular (rank n-1 < 2048), where
    float32 Newton-Schulz diverges — so the square roots here use eigh
    (TPU-supported, still fully on device). scipy's sqrtm on the same
    matrices yields complex values the reference simply truncates
    (frechet_inception_distance.py:37-38); parity is asserted in tests.
    """
    s1 = _sqrtm_psd_eigh(sigma1)
    inner = _mm(_mm(s1, sigma2), s1)
    inner = 0.5 * (inner + inner.T)
    w = jnp.linalg.eigvalsh(inner)
    return jnp.sum(jnp.sqrt(jnp.clip(w, 0.0, None)))


# ---------------------------------------------------------------------------
# FID statistics
# ---------------------------------------------------------------------------


def activation_statistics(acts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and (rowvar=False, ddof=1) covariance, as numpy.cov does
    (frechet_inception_distance.py:30-31)."""
    n = acts.shape[0]
    mu = jnp.mean(acts, axis=0)
    centered = acts - mu
    sigma = _mm(centered.T, centered) / (n - 1)
    return mu, sigma


def frechet_distance(
    mu1: jnp.ndarray, sigma1: jnp.ndarray, mu2: jnp.ndarray, sigma2: jnp.ndarray
) -> jnp.ndarray:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 (s1 s2)^(1/2))
    (frechet_inception_distance.py:33-41)."""
    ssdiff = jnp.sum((mu1 - mu2) ** 2)
    return ssdiff + jnp.trace(sigma1) + jnp.trace(sigma2) - 2.0 * trace_sqrt_product(
        sigma1, sigma2
    )


def frechet_distance_lowrank(acts1: jnp.ndarray, acts2: jnp.ndarray) -> jnp.ndarray:
    """Exact FID straight from activations, stable in the reference's
    small-sample regime (44 images vs 2048 features).

    With sample covariances S_i = A_i^T A_i / (n_i - 1) (A_i centered), the
    nonzero eigenvalues of S_1 S_2 equal those of C C^T with
    C = A_1 A_2^T / sqrt((n_1-1)(n_2-1)) — an (n_1, n_2) matrix — so
    Tr((S_1 S_2)^(1/2)) is exactly the nuclear norm of C. This avoids the
    rank-deficient 2048x2048 eigendecomposition entirely: the float32 eigh
    path carries an O(10) absolute error floor on near-identical sets at
    n = 44 (see tests/test_fid.py), while the cross-Gram SVD is tiny and
    well-conditioned. Mathematically identical to
    frechet_inception_distance.py:25-41 for sample covariances.
    """
    n1, n2 = acts1.shape[0], acts2.shape[0]
    mu1 = jnp.mean(acts1, axis=0)
    mu2 = jnp.mean(acts2, axis=0)
    a1 = (acts1 - mu1).astype(jnp.float32)
    a2 = (acts2 - mu2).astype(jnp.float32)
    ssdiff = jnp.sum((mu1 - mu2) ** 2)
    tr1 = jnp.sum(a1 * a1) / (n1 - 1)  # == Tr(S_1)
    tr2 = jnp.sum(a2 * a2) / (n2 - 1)
    c = _mm(a1, a2.T) / jnp.sqrt(jnp.asarray((n1 - 1) * (n2 - 1), jnp.float32))
    sv = jnp.linalg.svd(c, compute_uv=False)
    return ssdiff + tr1 + tr2 - 2.0 * jnp.sum(sv)


def frechet_distance_scipy(mu1, sigma1, mu2, sigma2) -> float:
    """CPU/scipy reference path, byte-for-byte the reference's formula."""
    from scipy.linalg import sqrtm

    mu1, sigma1, mu2, sigma2 = (np.asarray(x, np.float64) for x in (mu1, sigma1, mu2, sigma2))
    ssdiff = np.sum((mu1 - mu2) ** 2.0)
    covmean = sqrtm(sigma1.dot(sigma2))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(ssdiff + np.trace(sigma1 + sigma2 - 2.0 * covmean))


def load_directory_of_images(path: str) -> np.ndarray:
    """Stack every image in a directory (frechet_inception_distance.py:44-47,
    skimage.imread -> PIL here)."""
    import os

    from PIL import Image

    files = sorted(os.listdir(path))
    images = [np.asarray(Image.open(os.path.join(path, f))) for f in files]
    return np.asarray(images)


# ---------------------------------------------------------------------------
# Public evaluator
# ---------------------------------------------------------------------------


class FidEvaluator:
    """On-TPU FID with a module-level-singleton-free design.

    Usage:
        fid = FidEvaluator()                       # builds/loads InceptionV3
        value = fid.compare(real_images, fake_images)

    `compare` accepts (N, H, W, C) arrays (C = 3 or 4), applies the
    reference preprocessing chain, and reduces on device. Set
    PHG_INCEPTION_WEIGHTS to a converted-weights .npz for pretrained
    features (see models/inception.py).
    """

    def __init__(
        self,
        batch_size: int = 11,
        reference_quirks: bool = True,
        input_size: int = 299,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh whose FIRST axis is the data
        axis (make_mesh's layout regardless of its data_axis name — the
        Trainer may rename it via config.data_axis); Inception forwards
        then shard the image batch across it (activations are per-sample,
        so values are unchanged — asserted in tests/test_parallel.py).
        batch_size is rounded up to a multiple of the data-axis size."""
        self.model, self.variables = inception_mod.load_params(input_size=input_size)
        self.mesh = mesh
        if mesh is not None:
            data_axis = mesh.axis_names[0]
            ndev = mesh.shape[data_axis]
            batch_size = -(-batch_size // ndev) * ndev
        self.batch_size = batch_size
        self.input_size = input_size
        self.reference_quirks = reference_quirks

        def _features_fn(variables, images, quirks):
            images = images.astype(jnp.float32)
            scaled = scale_images_nn(images, self.input_size, quirks)
            pre = preprocess_input(scaled)
            return self.model.apply(variables, pre)

        if mesh is None:
            self._features = jax.jit(_features_fn, static_argnames=("quirks",))
        else:
            from jax.sharding import NamedSharding, PartitionSpec

            data_sh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            repl = NamedSharding(mesh, PartitionSpec())
            self._data_sharding = data_sh
            self._features = jax.jit(
                _features_fn,
                static_argnames=("quirks",),
                in_shardings=(None, data_sh),
                out_shardings=repl,
            )
        self._distance = jax.jit(frechet_distance)
        self._distance_lowrank = jax.jit(frechet_distance_lowrank)

    def activations(self, images) -> jnp.ndarray:
        images = jnp.asarray(images)
        n = images.shape[0]
        b = self.batch_size
        chunks = []
        for i in range(0, n, b):
            chunk = images[i : i + b]
            if chunk.shape[0] < b:  # pad to static shape, drop after
                pad = b - chunk.shape[0]
                chunk = jnp.concatenate([chunk, jnp.zeros((pad,) + chunk.shape[1:], chunk.dtype)])
            else:
                pad = 0
            if self.mesh is not None:
                # eval images arrive committed to one device (or sharded by
                # the DP generate); jit's explicit in_shardings refuses to
                # reshard committed args, so place the chunk explicitly
                chunk = jax.device_put(chunk, self._data_sharding)
            acts = self._features(self.variables, chunk, self.reference_quirks)
            chunks.append(acts[: b - pad] if pad else acts)
        return jnp.concatenate(chunks, axis=0)

    def compare(self, images1, images2, method: str = "auto") -> float:
        """FID between two image sets (frechet_inception_distance.py:79-80).

        Each argument is an (N, H, W, C) array or a directory path of images
        (frechet_inception_distance.py:50-58).

        method:
          - "auto" (default): the exact low-rank cross-Gram path when either
            sample count is below the feature dimension (always true at the
            reference's n=44), else the eigh matrix path
          - "lowrank" / "eigh" ("newton-schulz" alias): force a device path
          - "scipy": the reference's CPU formula, for parity checks
        """
        if isinstance(images1, str):
            images1 = load_directory_of_images(images1)
        if isinstance(images2, str):
            images2 = load_directory_of_images(images2)
        acts1 = self.activations(images1)
        acts2 = self.activations(images2)
        if method == "auto":
            small = min(acts1.shape[0], acts2.shape[0]) < acts1.shape[1]
            method = "lowrank" if small else "eigh"
        if method == "lowrank":
            return float(self._distance_lowrank(acts1, acts2))
        mu1, s1 = activation_statistics(acts1)
        mu2, s2 = activation_statistics(acts2)
        if method == "scipy":
            return frechet_distance_scipy(mu1, s1, mu2, s2)
        return float(self._distance(mu1, s1, mu2, s2))
