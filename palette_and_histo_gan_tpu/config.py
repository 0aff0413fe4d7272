"""Configuration for the TPU-native palette-and-histo-gan framework.

Replaces the reference's star-imported constants module
(/root/reference/configuration.py:1-35) and the notebook-cell knobs
(/root/reference/experiments.ipynb cells 5, 9, 10) with a frozen dataclass
that is hashable, so it can be closed over by jitted functions as a static
argument.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Tuple

# ---------------------------------------------------------------------------
# Dataset-level constants (reference: configuration.py:4-34)
# ---------------------------------------------------------------------------

SEED = 47

DIRECTIONS = ("back", "left", "front", "right")
DIRECTION_BACK = 0
DIRECTION_LEFT = 1
DIRECTION_FRONT = 2
DIRECTION_RIGHT = 3
DIRECTION_FOLDERS = tuple(f"{i}-{name}" for i, name in enumerate(DIRECTIONS))

DATASET_SIZES = (294,)
DATASET_SIZE = sum(DATASET_SIZES)
TRAIN_PERCENTAGE = 0.85
TRAIN_SIZES = tuple(math.ceil(n * TRAIN_PERCENTAGE) for n in DATASET_SIZES)
TRAIN_SIZE = sum(TRAIN_SIZES)  # 250
TEST_SIZES = tuple(
    DATASET_SIZES[i] - TRAIN_SIZES[i] for i in range(len(DATASET_SIZES))
)
TEST_SIZE = sum(TEST_SIZES)  # 44

BATCH_SIZE = 4
IMG_SIZE = 64
INPUT_CHANNELS = 4
OUTPUT_CHANNELS = 4

MAX_PALETTE_SIZE = 256
# hotpink filler for unused palette slots (reference: configuration.py:32)
INVALID_INDEX_COLOR = (255, 0, 220, 255)

TEMP_FOLDER = "temp-side2side"

MODEL_VARIANTS = ("baseline-no-aug", "baseline", "indexed", "histogram")
PALETTE_ORDERINGS = ("top2bottom", "bottom2top", "grayness", "shuffled")


def default_data_root() -> str:
    """Dataset root; the reference vendors it under datasets/rpg-maker-xp."""
    env = os.environ.get("PHG_DATA_ROOT")
    if env:
        return env
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    candidates = [
        os.path.join(here, "datasets", "rpg-maker-xp"),
        "/root/reference/datasets/rpg-maker-xp",
    ]
    for c in candidates:
        if os.path.isdir(c):
            return c
    return candidates[0]


# ---------------------------------------------------------------------------
# Experiment config (reference: experiments.ipynb cells 5, 9, 10)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Config:
    """All knobs of the reference experiments, plus TPU-specific ones.

    Reference hyperparameters (experiments.ipynb cell 9):
      - baseline (no aug.) / baseline: lambda_l1=100
      - histogram:                     lambda_l1=30,  lambda_histogram=1
      - indexed:                       lambda_segmentation=0.01 (lambda_l1=0)
    """

    model: str = "baseline-no-aug"  # one of MODEL_VARIANTS
    source_direction: int = DIRECTION_FRONT
    target_direction: int = DIRECTION_RIGHT
    palette_ordering: str = "grayness"  # for the indexed variant

    # losses
    lambda_l1: float = 100.0
    lambda_histogram: float = 1.0
    lambda_segmentation: float = 0.01

    # optimizer (reference: pix2pix_model.py:28-29; keras Adam eps default 1e-7)
    learning_rate: float = 2e-4
    beta1: float = 0.5
    beta2: float = 0.999
    adam_eps: float = 1e-7

    # schedule (reference: experiments.ipynb cell 10)
    epochs: int = 160
    batch_size: int = BATCH_SIZE
    seed: int = SEED

    # data
    img_size: int = IMG_SIZE
    input_channels: int = INPUT_CHANNELS
    output_channels: int = OUTPUT_CHANNELS
    augment_probability: float = 0.8
    data_root: str = dataclasses.field(default_factory=default_data_root)
    # multi-dataset loading (reference: DATA_FOLDERS/DATASET_SIZES lists,
    # configuration.py:6,15-21; global-index resolution across the imaginary
    # concatenation at dataset_utils.py:186-190). Empty data_roots means
    # (data_root,). dataset_sizes must align 1:1 with the roots; per-root
    # train/test sizes follow the ceil(0.85 * n) split rule.
    data_roots: Tuple[str, ...] = ()
    dataset_sizes: Tuple[int, ...] = DATASET_SIZES

    # histogram loss (reference: histogram.py:36)
    histogram_size: int = 64
    histogram_method: str = "inverse-quadratic"
    histogram_sigma: float = 0.02
    # fused-VJP dot structure for the histogram backward: "tri" (one dot per
    # gradient chain; certified optimum of the 6-structure XLA matrix — see
    # docs/DESIGN.md round-3 bandwidth accounting), "dual", "tri2",
    # "tri2b", "tri2c" (ops/histogram.py), or "pallas" (XLA forward +
    # blocked single-pass Mosaic backward, ops/histogram_pallas3.py)
    histogram_bwd: str = "tri"
    # XLA compiler options for the train step/chunk jits, applied on TPU
    # only (the CPU XLA rejects TPU-only option names). The scoped-VMEM
    # limit was laddered on v5e (docs/DESIGN.md; default ~16 MiB -> 55.8
    # ms/step, 24 M -> 53.5, 32 M -> 52.7, 40 M -> 52.5 (best), 48 M ->
    # 52.6, 64 M -> 52.9, 96 M -> 54.0, 128 M -> 55.4): a 40 MiB scoped
    # window lets the compiler keep conv/fusion operands VMEM-resident
    # without starving prefetch double-buffering.
    xla_compiler_options: tuple = (("xla_tpu_scoped_vmem_limit_kib", "40960"),)
    # narrow conv heads: "swapgrad" (weight-grad operand roles swapped so
    # the wide C_in drives the emitter instead of the narrow C_out;
    # device clock 47.2 -> 45.4 ms on the flagship; applies only when
    # C_out <= 8, so the indexed 256-wide G head keeps the standard grad),
    # "narrow" (plain nn.Conv), or "dup8" (channel duplication,
    # models/networks.py::DupOutConv; measured negative)
    head_conv: str = "swapgrad"
    # generator head lowering for INFERENCE-ONLY programs (generate_core):
    # "train" reuses head_conv; "nchw" recomputes the head conv with an
    # NCHW out_spec (models/networks.py::NCHWOutConv) — in a program with
    # no backward, XLA gives the narrow head a channels-minor layout and
    # the degenerate EmitOutputBatchInSublanes emitter (11.4 ms of a 21 ms
    # batch-1024 generator forward on v5e); spatial-minor output restores
    # the train-program emitter. Same params either way.
    infer_head_conv: str = "train"
    # discriminator first conv: split-concat form (networks.py::
    # _SplitConcatConv) that lets XLA CSE the shared source-half conv
    d_input_split: bool = False
    # histogram implementation: "xla" (ops/histogram.py, fused VJP),
    # "pallas" (v1 kernel, f32 (HW, size) layout), or "pallas2" (v2 kernel,
    # bf16 (size, HW) lane-full layout) — device-clock A/B picks the default
    histogram_impl: str = "xla"
    # augmentation implementation: "xla" (ops/augment.py one-hot-matmul
    # shift), "pallas" (ops/augment_pallas.py fused one-pass kernel:
    # hue + shift + select + normalize in VMEM, uint8 in / f32 out), or
    # "auto" (pallas on TPU — device-clock A/B: baseline step
    # 38.85 -> 35.54 ms — both single-chip and under a DP mesh, where the
    # kernel rides shard_map (augment_batch_pallas_sharded) because GSPMD
    # does not auto-partition a pallas_call; xla on CPU, where Mosaic
    # kernels don't run)
    augment_impl: str = "auto"

    # network widths (reference: networks.py:57-73); overridable so tests and
    # dry runs can construct the *real* Trainer with narrow, fast-compiling
    # networks (same topology, same code path)
    down_filters: Tuple[int, ...] = (64, 128, 256, 512, 512, 512)
    up_filters: Tuple[int, ...] = (512, 512, 256, 128, 64, 32)

    # TPU-specific
    compute_dtype: str = "float32"  # "float32" or "bfloat16" for conv compute
    # transposed-conv lowering: "lax_flipgrad" (flax ConvTranspose forward;
    # weight-grad expressed so XLA reverses the (4,4,Cin,Cout) RESULT
    # instead of the (B,2H,2W,C) cotangent — kills the 524 MB/step
    # reverse.75-80 round-trips, flagship 49.0 -> 47.2 ms on the device
    # clock; models/networks.py::_convt_k4s2_flipgrad), "lax" (plain flax
    # ConvTranspose, identical forward, for lowering comparison), or
    # "subpixel" (exact phase-decomposed alternative, kept for comparison;
    # the interleave shuffles cost more than the dilation saves here)
    transpose_impl: str = "lax_flipgrad"
    # PRNG used for the dropout masks: "threefry" (JAX default — ~10 VPU
    # ops/element, fused into the UpBlock conv fusions) or "rbg" (the
    # TPU-hardware-backed RBG generator — the default). Dropout draws are
    # the one place RNG implementation is free: the reference's TF dropout
    # stream cannot be matched either way (the parity fixtures disable
    # dropout), so only mask generation COST differs. Measured on the
    # flagship (device trace): dropout costs 1.83 ms/step total under
    # threefry (deterministic_dropout=True A/B: 43.23 -> 41.40); rbg
    # recovers 1.37 of it (43.23 -> 41.86, -3.2%/step). docs/DESIGN.md.
    # "rbg" means "hardware RBG wherever it is measured-faster AND
    # semantically safe": mesh-sharded paths always keep threefry (XLA's
    # RngBitGenerator stream has no SPMD-invariance/prefix-stability
    # guarantees — parallel/dp.py's bit-equality contract needs them), and
    # the dropout-on generate path keeps threefry above
    # steps.RBG_GENERATE_MAX_BATCH (measured large-batch serving
    # regression). See train/steps.py::_dropout_key.
    dropout_prng: str = "rbg"
    # Parity/testing hook: run the generator's dropout layers in
    # deterministic (identity) mode inside the TRAIN steps. The reference
    # always trains with dropout active (training=True everywhere,
    # pix2pix_model.py:60,67) so production keeps False; the closed-loop
    # trajectory-parity fixtures (scripts/make_golden_trajectory.py) set it
    # True because dropout RNG cannot be matched across frameworks.
    deterministic_dropout: bool = False
    data_axis: str = "data"  # DP mesh axis name
    # data parallelism: "auto" builds a mesh over all visible devices when
    # more than one is present (and the batch divides), "on" forces it,
    # "off" pins single-device execution (SURVEY.md §2.3)
    data_parallel: str = "auto"
    donate_state: bool = True

    # bookkeeping
    temp_folder: str = TEMP_FOLDER

    def __post_init__(self):
        """Fail at construction, not at trace time deep inside a jit."""
        _check = {
            "model": (self.model, MODEL_VARIANTS),
            "palette_ordering": (
                self.palette_ordering,
                ("top2bottom", "bottom2top", "grayness", "shuffled"),
            ),
            "histogram_method": (
                self.histogram_method, ("RBF", "inverse-quadratic")
            ),
            "histogram_bwd": (
                self.histogram_bwd,
                ("tri", "dual", "tri2", "tri2b", "tri2c", "pallas"),
            ),
            "histogram_impl": (
                self.histogram_impl, ("xla", "pallas", "pallas2")
            ),
            "augment_impl": (self.augment_impl, ("auto", "xla", "pallas")),
            "transpose_impl": (
                self.transpose_impl, ("lax", "lax_flipgrad", "subpixel")
            ),
            "head_conv": (
                self.head_conv, ("swapgrad", "narrow", "dup8", "nchw")
            ),
            "infer_head_conv": (self.infer_head_conv, ("train", "nchw")),
            "compute_dtype": (
                self.compute_dtype, ("float32", "bfloat16")
            ),
            "data_parallel": (self.data_parallel, ("auto", "on", "off")),
            "dropout_prng": (self.dropout_prng, ("threefry", "rbg")),
        }
        for field, (value, valid) in _check.items():
            if value not in valid:
                raise ValueError(
                    f"config.{field}={value!r}; valid: {valid}"
                )
        for field in ("source_direction", "target_direction"):
            if getattr(self, field) not in range(len(DIRECTIONS)):
                raise ValueError(
                    f"config.{field}={getattr(self, field)!r}; valid: 0-3 "
                    f"({', '.join(DIRECTIONS)})"
                )
        # Validate against the *effective* roots so a dataset_sizes override
        # misaligned with the single default data_root also fails here, at
        # construction, instead of later inside the loader.
        if len(self.effective_data_roots) != len(self.dataset_sizes):
            raise ValueError(
                f"data roots ({len(self.effective_data_roots)}: "
                f"{self.effective_data_roots}) and dataset_sizes "
                f"({len(self.dataset_sizes)}: {self.dataset_sizes}) must "
                "align 1:1; pass --data-roots/--dataset-sizes together"
            )
        if any(n < 1 for n in self.dataset_sizes):
            raise ValueError(
                f"dataset_sizes entries must be >= 1, got {self.dataset_sizes}"
            )
        if self.batch_size < 1 or self.epochs < 1:
            raise ValueError(
                f"batch_size ({self.batch_size}) and epochs ({self.epochs}) "
                "must be >= 1"
            )
        if len(self.down_filters) != len(self.up_filters):
            raise ValueError(
                f"down_filters ({len(self.down_filters)}) and up_filters "
                f"({len(self.up_filters)}) must have the same depth"
            )

    @property
    def architecture_name(self) -> str:
        return (
            f"{DIRECTIONS[self.source_direction]}-to-"
            f"{DIRECTIONS[self.target_direction]}"
        )

    @property
    def effective_data_roots(self) -> Tuple[str, ...]:
        return self.data_roots if self.data_roots else (self.data_root,)

    @property
    def train_sizes(self) -> Tuple[int, ...]:
        """Per-dataset train sizes, ceil(0.85 * n) (configuration.py:17-18)."""
        return tuple(math.ceil(n * TRAIN_PERCENTAGE) for n in self.dataset_sizes)

    @property
    def test_sizes(self) -> Tuple[int, ...]:
        return tuple(
            n - t for n, t in zip(self.dataset_sizes, self.train_sizes)
        )

    @property
    def train_size(self) -> int:
        return sum(self.train_sizes)

    @property
    def steps(self) -> int:
        """ceil(TRAIN_SIZE / batch) * epochs (experiments.ipynb cell 10)."""
        return math.ceil(self.train_size / self.batch_size) * self.epochs

    @property
    def update_steps(self) -> int:
        return max(self.steps // 40, 1)

    @property
    def is_indexed(self) -> bool:
        return self.model == "indexed"

    @property
    def generator_in_channels(self) -> int:
        return 1 if self.is_indexed else self.input_channels

    @property
    def generator_out_channels(self) -> int:
        return MAX_PALETTE_SIZE if self.is_indexed else self.output_channels

    @property
    def generator_last_activation(self) -> str:
        return "softmax" if self.is_indexed else "tanh"

    @property
    def discriminator_in_channels(self) -> int:
        return 1 if self.is_indexed else self.input_channels

    @property
    def effective_lambda_l1(self) -> float:
        # the indexed variant forces lambda_l1 to 0 (pix2pix_model.py:263)
        return 0.0 if self.is_indexed else self.lambda_l1

    @property
    def uses_augmentation(self) -> bool:
        return self.model in ("baseline", "histogram")

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def config_for_variant(variant: str, **overrides) -> Config:
    """Build the per-variant config exactly as experiments.ipynb cell 9 does."""
    if variant not in MODEL_VARIANTS:
        raise ValueError(f"unknown variant {variant!r}; use one of {MODEL_VARIANTS}")
    base = dict(model=variant)
    if variant == "histogram":
        base["lambda_l1"] = 30.0
        base["lambda_histogram"] = 1.0
    elif variant == "indexed":
        base["lambda_segmentation"] = 0.01
    else:
        base["lambda_l1"] = 100.0
    base.update(overrides)
    return Config(**base)
