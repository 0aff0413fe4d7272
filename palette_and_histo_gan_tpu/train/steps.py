"""Jitted train steps for the four model variants.

Replaces the reference's tf.GradientTape train_steps
(/root/reference/pix2pix_model.py:62-89 and :295-325) with pure functions:
the persistent-tape + two-gradient structure becomes one
`jax.value_and_grad` for the generator (whose aux output carries the fake
image, so the generator forward runs once) and one for the discriminator on
the stop-gradient'ed fake.

Variant semantics (SURVEY.md §2 #12-15):
  - baseline / baseline-no-aug: G = BCE(1, D(fake)) + lambda_l1 * L1
  - histogram: + lambda_hist * Hellinger(hist(real), hist(fake)), lambda_l1=30
  - indexed: G input/output are palette-index maps; D sees raw index maps;
    argmax is non-differentiable so the adversarial term carries no gradient
    to G (faithfully reproduced — only the CCE segmentation term trains G);
    lambda_l1 forced to 0

Augmentation and normalization run *inside* the step on raw [0, 255] device-
resident batches, so the whole training path is one XLA program.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ..config import Config
from ..ops import augment as augment_ops
from ..ops import histogram as hist_ops
from ..ops.image import normalize
from .losses import (
    bce_with_logits,
    discriminator_loss,
    generator_loss,
    onehot_l1_logits,
    sparse_categorical_crossentropy_logits,
)
from .state import Models, TrainState


def _apply_generator(models: Models, params, source, rng, deterministic=False):
    """Generator forward with dropout active, as the reference always runs it
    (training=True everywhere, pix2pix_model.py:60,67).
    deterministic=True (config.deterministic_dropout) is the parity-fixture
    hook: dropout RNG cannot be matched across frameworks, so the closed-loop
    trajectory fixtures disable it on both sides."""
    return models.generator.apply(
        {"params": params},
        source,
        deterministic=deterministic,
        rngs={"dropout": rng},
    )


def _apply_generator_logits(models: Models, params, source, rng, deterministic=False):
    """Generator forward returning pre-softmax logits (indexed variant).

    The softmax head (pix2pix_model.py:267-268) has no parameters, so applying
    a linear-activation clone of the same module with the same params yields
    exactly softmax^{-1}-composable logits: argmax and the log-space losses
    (train/losses.py) are computed from them without ever materializing the
    (B, H, W, 256) probability tensor."""
    logits_gen = models.generator.clone(last_activation="linear")
    return logits_gen.apply(
        {"params": params},
        source,
        deterministic=deterministic,
        rngs={"dropout": rng},
    )


def _apply_discriminator(models: Models, params, target, source):
    return models.discriminator.apply({"params": params}, target, source)


# Measured crossover for the dropout-on generate path (DESIGN.md, round-4/5
# serving A/B on v5e, device clock): RBG mask generation wins at batch 256
# (2.199 -> 2.090 ms) but loses at batch 1024 (9.571 -> 10.126 ms) where its
# different fusion shapes cost more than the cheaper draws save. Batches up
# to this bound use RBG under config.dropout_prng="rbg"; larger ones keep
# threefry. Train steps are not batch-gated: RBG won at every trained batch.
RBG_GENERATE_MAX_BATCH = 256


def _dropout_key(config: Config, key, *, mesh=None, batch=None):
    """Re-wrap the step's dropout key per config.dropout_prng.

    "rbg": the mask stream runs on the TPU's hardware RBG instead of
    ~10-VPU-op threefry — dropout draws are implementation-free (the
    reference's TF stream cannot be matched either way; parity fixtures
    disable dropout), so only generation cost changes. The 2-word source
    key is duplicated into the 4-word RBG key: step keys are distinct, so
    per-step mask streams stay distinct.

    Two guards keep "rbg" semantics safe and fast where it measurably isn't:
      * mesh is not None -> threefry. XLA's RngBitGenerator stream is
        implementation-defined: unlike partitionable threefry it is NOT
        guaranteed prefix-stable under batch padding or invariant under
        SPMD sharding, so every mesh-sharded path keeps threefry — that is
        the contract behind parallel/dp.py's pad-and-slice generate and the
        DP-vs-single bit-equality tests (tests/test_parallel.py).
      * batch > RBG_GENERATE_MAX_BATCH (inference callers pass it) ->
        threefry, per the measured large-batch serving regression.
    """
    if getattr(config, "dropout_prng", "threefry") != "rbg":
        return key
    if mesh is not None:
        return key
    if batch is not None and batch > RBG_GENERATE_MAX_BATCH:
        return key
    data = (
        jax.random.key_data(key)
        if jnp.issubdtype(key.dtype, jax.dtypes.prng_key)
        else key
    )
    return jax.random.wrap_key_data(
        jnp.concatenate([data, data]), impl="rbg"
    )


def _optimizer_updates(models: Models, state: TrainState, g_grads, d_grads, rng):
    g_updates, g_opt_state = models.g_tx.update(
        g_grads, state.g_opt_state, state.g_params
    )
    d_updates, d_opt_state = models.d_tx.update(
        d_grads, state.d_opt_state, state.d_params
    )
    return TrainState(
        step=state.step + 1,
        g_params=optax.apply_updates(state.g_params, g_updates),
        d_params=optax.apply_updates(state.d_params, d_updates),
        g_opt_state=g_opt_state,
        d_opt_state=d_opt_state,
        rng=rng,
    )


# ---------------------------------------------------------------------------
# RGBA variants (baseline, baseline-no-aug, histogram)
# ---------------------------------------------------------------------------


def _resolve_augment_impl(config: Config, mesh=None) -> str:
    """config.augment_impl with "auto" resolved at trace time.

    "auto" picks the fused Pallas kernel (ops/augment_pallas.py) on TPU —
    the device-clock A/B winner — and the XLA path on CPU (Mosaic kernels
    don't run there). Under a DP mesh the kernel rides shard_map
    (ops/augment_pallas.py::augment_batch_pallas_sharded): a pallas_call is
    not automatically partitioned by GSPMD, so each device runs it on its
    local batch shard.
    """
    impl = getattr(config, "augment_impl", "auto")
    if impl != "auto":
        return impl
    del mesh  # the mesh only selects the sharded kernel form, not the impl
    # On TPU the Pallas kernel always wins the A/B (baseline step 38.85 ->
    # 35.54 ms). Without a mesh the jit runs on a single device, so the
    # unsharded pallas_call is fine even on a multi-device host; with a mesh
    # the shard_map form partitions it. No device_count guard needed.
    if jax.default_backend() == "tpu":
        return "pallas"
    return "xla"


def rgba_train_step(
    config: Config, models: Models, state: TrainState, source, target,
    *, mesh=None,
):
    """One optimization step on a raw [0, 255] RGBA batch (uint8 or float).

    `mesh` (bound via functools.partial by parallel/dp.py, never traced)
    switches the Pallas augmentation to its shard_map form so it partitions
    over the data axis like the rest of the step.
    """
    rng, k_aug, k_drop = jax.random.split(state.rng, 3)
    k_drop = _dropout_key(config, k_drop, mesh=mesh)

    if config.uses_augmentation and _resolve_augment_impl(config, mesh) == "pallas":
        # fused one-pass kernel; consumes the gathered batch directly —
        # either unpacked uint8 or, from the chunk factories, the 4-byte-lane
        # gather's uint32-packed pixels (the channel unpack then happens in
        # VMEM and the XLA-side u32 -> u8 pass never exists) — and folds the
        # [0,255] -> [-1,1] normalize into its write
        from ..ops.augment_pallas import (
            augment_batch_pallas,
            augment_batch_pallas_packed,
            augment_batch_pallas_sharded,
        )

        # in bf16 compute mode the kernel writes bf16 directly: every
        # consumer (both nets' first convs, the histogram chain's dtype
        # cast) converts to bf16 anyway, so the values are bitwise what the
        # downstream converts would produce, at half the kernel's HBM write
        # traffic and without the convert/relayout passes (trace A/B in
        # docs/DESIGN.md). The L1 term then sees a bf16-rounded target
        # (<= 1 ulp bf16), within the documented bf16-mode envelope.
        aug_dtype = jnp.dtype(config.compute_dtype)
        if mesh is not None:
            source, target = augment_batch_pallas_sharded(
                source, target, k_aug, config.augment_probability,
                normalize_out=True, out_dtype=aug_dtype,
                mesh=mesh, axis=config.data_axis,
            )
        else:
            aug_fn = (
                augment_batch_pallas_packed
                if source.dtype == jnp.uint32
                else augment_batch_pallas
            )
            source, target = aug_fn(
                source, target, k_aug, config.augment_probability,
                normalize_out=True, out_dtype=aug_dtype,
            )
    else:
        if source.dtype == jnp.uint32:  # packed pixels (see step_wants_packed)
            source = _unpack_rows_u32(source, (0, 64, 64, 4))
            target = _unpack_rows_u32(target, (0, 64, 64, 4))
        # the HBM-resident dataset is uint8 (data/loader.py::prepare_rgba);
        # the upcast fuses into the gather's consumer
        source = source.astype(jnp.float32)
        target = target.astype(jnp.float32)
        if config.uses_augmentation:
            source, target = augment_ops.augment_batch(
                source, target, k_aug, config.augment_probability
            )
        source = normalize(source)
        target = normalize(target)

    use_hist = config.model == "histogram"
    if config.histogram_impl == "pallas":
        from ..ops.histogram_pallas import calculate_rgbuv_histogram_pallas

        def hist_fn(batch, **kw):
            kw.pop("dtype", None)  # the v1 Pallas kernel computes in float32
            return calculate_rgbuv_histogram_pallas(batch, **kw)

    elif config.histogram_impl == "pallas2":
        from ..ops.histogram_pallas2 import calculate_rgbuv_histogram_pallas2

        hist_fn = calculate_rgbuv_histogram_pallas2
    else:
        hist_fn = hist_ops.calculate_rgbuv_histogram

    # the histogram kernel chain follows the conv compute dtype: bfloat16
    # mixed-precision mode speeds the dominant loss term ~3.5x with ~0.1%
    # loss-value deviation (docs/DESIGN.md); float32 default is bit-close to
    # the reference
    hist_dtype = jnp.dtype(config.compute_dtype)

    def g_loss_fn(g_params):
        fake = _apply_generator(
            models, g_params, source, k_drop,
            deterministic=config.deterministic_dropout,
        )
        fake_pred = _apply_discriminator(models, state.d_params, fake, source)
        metrics = generator_loss(fake_pred, fake, target, config.effective_lambda_l1)
        if use_hist:
            # two separate histogram calls: stacking (real, fake) into one
            # batch-2B call was A/B-tested and measured 28% SLOWER end to end
            # — the concat materializes a (2B, H, W, C) copy and breaks XLA's
            # fusion of the kernel chain into the histogram matmul operands
            kwargs = dict(
                size=config.histogram_size,
                method=config.histogram_method,
                sigma=config.histogram_sigma,
                dtype=hist_dtype,
            )
            if config.histogram_impl == "xla":
                kwargs["bwd"] = config.histogram_bwd
            real_hist = hist_fn(target, **kwargs)
            fake_hist = hist_fn(fake, **kwargs)
            h_loss = hist_ops.hellinger_loss(real_hist, fake_hist)
            metrics = dict(metrics, histogram_loss=h_loss)
            metrics["total_loss"] = (
                metrics["total_loss"] + config.lambda_histogram * h_loss
            )
        return metrics["total_loss"], (metrics, fake)

    (_, (g_metrics, fake)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
        state.g_params
    )

    fake_sg = jax.lax.stop_gradient(fake)

    def d_loss_fn(d_params):
        # two separate D passes, as the reference runs them
        # (pix2pix_model.py:69-70). Stacking (real, fake) into one batch-2B
        # conv pass was A/B-tested and measured ~6% SLOWER end to end on the
        # RGBA variants: the (2B, H, W, C) concats materialize copies and
        # defeat operand fusion (same pathology as the histogram stacking
        # above). The indexed variant keeps the merge — its D inputs are
        # 1-channel index maps, where the concat is cheap and the merge wins.
        real_pred = _apply_discriminator(models, d_params, target, source)
        fake_pred = _apply_discriminator(models, d_params, fake_sg, source)
        metrics = discriminator_loss(real_pred, fake_pred)
        return metrics["total_loss"], metrics

    (_, d_metrics), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        state.d_params
    )

    new_state = _optimizer_updates(models, state, g_grads, d_grads, rng)
    metrics = {f"generator/{k}": v for k, v in g_metrics.items()}
    metrics.update({f"discriminator/{k}": v for k, v in d_metrics.items()})
    return new_state, metrics


# ---------------------------------------------------------------------------
# Indexed variant
# ---------------------------------------------------------------------------


def indexed_train_step(
    config: Config, models: Models, state: TrainState, source_idx, target_idx,
    *, mesh=None,
):
    """One step on palette-index maps (pix2pix_model.py:295-325).

    D consumes raw index maps cast to float (values 0..255); the G adversarial
    term flows through an argmax and therefore contributes no generator
    gradient — only lambda_seg * CCE trains G, as in the reference.

    `mesh` (bound via functools.partial by parallel/dp.py, never traced)
    only pins the dropout PRNG to threefry under SPMD (see _dropout_key).
    """
    rng, k_drop = jax.random.split(state.rng)
    k_drop = _dropout_key(config, k_drop, mesh=mesh)

    source = source_idx.astype(jnp.float32)  # (B, H, W, 1), raw index scale
    real = target_idx.astype(jnp.float32)
    labels = target_idx[..., 0]  # sparse labels; neither the one-hot tensor
    # nor the softmax probability tensor ((B, H, W, 256) float) is ever
    # materialized — argmax is softmax-invariant and the log-space loss forms
    # below are exact equalities with the keras probs forms (train/losses.py)

    def g_loss_fn(g_params):
        logits = _apply_generator_logits(
            models, g_params, source, k_drop,
            deterministic=config.deterministic_dropout,
        )
        fake_idx = jnp.argmax(logits, axis=-1)[..., None].astype(jnp.float32)
        fake_pred = _apply_discriminator(models, state.d_params, fake_idx, source)
        adversarial = bce_with_logits(jnp.ones_like(fake_pred), fake_pred)
        l1 = onehot_l1_logits(labels, logits)  # lambda_l1 is 0; logged only
        seg = sparse_categorical_crossentropy_logits(labels, logits)
        total = (
            adversarial
            + config.effective_lambda_l1 * l1
            + config.lambda_segmentation * seg
        )
        metrics = {
            "total_loss": total,
            "adversarial_loss": adversarial,
            "l1_loss": l1,
            "segmentation_loss": seg,
        }
        return total, (metrics, fake_idx)

    (_, (g_metrics, fake_idx)), g_grads = jax.value_and_grad(
        g_loss_fn, has_aux=True
    )(state.g_params)

    fake_sg = jax.lax.stop_gradient(fake_idx)

    def d_loss_fn(d_params):
        # one conv pass over the stacked (real, fake) batch — the PatchGAN is
        # per-sample, so the two reference passes (pix2pix_model.py:320-321)
        # produce identical logits. A/B on v5e: the merge wins here (+4% step
        # rate; the 1-channel index-map concats are cheap) but LOSES on the
        # RGBA variants (see rgba_train_step.d_loss_fn), so only this variant
        # stacks.
        preds = _apply_discriminator(
            models,
            d_params,
            jnp.concatenate([real, fake_sg], axis=0),
            jnp.concatenate([source, source], axis=0),
        )
        real_pred, fake_pred = jnp.split(preds, 2, axis=0)
        metrics = discriminator_loss(real_pred, fake_pred)
        return metrics["total_loss"], metrics

    (_, d_metrics), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
        state.d_params
    )

    new_state = _optimizer_updates(models, state, g_grads, d_grads, rng)
    metrics = {f"generator/{k}": v for k, v in g_metrics.items()}
    metrics.update({f"discriminator/{k}": v for k, v in d_metrics.items()})
    return new_state, metrics


# ---------------------------------------------------------------------------
# Step factories
# ---------------------------------------------------------------------------


def _pack_rows_u32(arr: jnp.ndarray):
    """uint8 (N, ..., 4) -> (uint32 (N, prod/4) view, original shape).

    The per-step batch gather from the HBM-resident uint8 splits runs ~2.3x
    faster over 4-byte lanes than byte lanes on v5e (0.122 vs 0.279 ms for
    the two 1024-row gathers, measured standalone). Packing is a pure
    bitcast — the pack sits OUTSIDE the scan (hoisted once per chunk) and
    the unpack after the gather reproduces the bytes exactly. Non-uint8
    datasets (indexed int32 maps, synthetic float batches) pass through.
    """
    if arr.dtype != jnp.uint8:
        return (arr, None)
    n = arr.shape[0]
    flat = arr.reshape(n, -1, 4)
    return (jax.lax.bitcast_convert_type(flat, jnp.uint32), arr.shape)


def _unpack_rows_u32(arr: jnp.ndarray, shape):
    """Inverse of _pack_rows_u32 on a gathered batch."""
    if shape is None:
        return arr
    b = arr.shape[0]
    return jax.lax.bitcast_convert_type(arr, jnp.uint8).reshape(
        (b,) + tuple(shape[1:])
    )


def step_wants_packed(config: Config, mesh=None) -> bool:
    """True when the train step consumes the 4-byte-lane gather's uint32
    pixels DIRECTLY (the Pallas augment kernel unpacks channels in VMEM), so
    the chunk factories skip the XLA-side u32 -> u8 unpack — an HBM round
    trip plus two materialized broadcast-shift relayout copies (~0.55
    ms/step at batch 1024, docs/DESIGN.md)."""
    return (
        not config.is_indexed
        and config.uses_augmentation
        and _resolve_augment_impl(config, mesh) == "pallas"
    )


def tpu_compiler_options(config: Config) -> dict | None:
    """config.xla_compiler_options as a dict on TPU, None elsewhere.

    TPU-only option names (e.g. xla_tpu_scoped_vmem_limit_kib, laddered in
    docs/DESIGN.md: 55.8 -> 52.6 ms/step on the flagship) abort the CPU XLA
    at parse time, so the options are applied only when the default backend
    is a TPU."""
    if jax.default_backend() != "tpu":
        return None
    return dict(getattr(config, "xla_compiler_options", ()) or ()) or None


def make_train_step(config: Config, models: Models) -> Callable:
    """Jitted (state, *batch) -> (state, metrics); donates the state buffers."""
    if config.is_indexed:
        fn = partial(indexed_train_step, config, models)
    else:
        fn = partial(rgba_train_step, config, models)
    return jax.jit(
        fn,
        donate_argnums=(0,) if config.donate_state else (),
        compiler_options=tpu_compiler_options(config),
    )


def make_train_chunk(config: Config, models: Models, dataset_size: int) -> Callable:
    """Many steps fused into one XLA program via lax.scan.

    (state, dataset_arrays, data_key, num_steps) -> (state, stacked_metrics)

    The device-resident dataset is a tuple of arrays with leading dim
    `dataset_size`; each scan iteration derives its batch from the
    epoch-permutation sampler (data.loader.batch_indices) keyed by the global
    step carried in the state — so a training run is a handful of XLA
    dispatches instead of one per step (the reference dispatches a tf.function
    per step plus per-step host logging, side2side_model.py:73-118).
    """
    from ..data.loader import batch_indices

    step_fn = (
        partial(indexed_train_step, config, models)
        if config.is_indexed
        else partial(rgba_train_step, config, models)
    )

    @partial(
        jax.jit,
        static_argnames=("num_steps",),
        donate_argnums=(0,) if config.donate_state else (),
        compiler_options=tpu_compiler_options(config),
    )
    def train_chunk(state: TrainState, dataset, data_key, num_steps: int):
        (src_p, src_shape), (tgt_p, tgt_shape) = (
            _pack_rows_u32(dataset[0]),
            _pack_rows_u32(dataset[1]),
        )

        packed = step_wants_packed(config) and src_shape is not None

        def body(state, _):
            idx = batch_indices(
                data_key, state.step, dataset_size, config.batch_size
            )
            if packed:  # the Pallas augment kernel unpacks in VMEM
                source, target = src_p[idx], tgt_p[idx]
            else:
                source = _unpack_rows_u32(src_p[idx], src_shape)
                target = _unpack_rows_u32(tgt_p[idx], tgt_shape)
            return step_fn(state, source, target)

        return jax.lax.scan(body, state, None, length=num_steps)

    return train_chunk


def inference_models(config: Config, models: Models) -> Models:
    """Models with config.infer_head_conv applied to both networks' heads.

    Inference-only head-conv lowering for backward-free programs
    (networks.py::NCHWOutConv — see the module docstring for the emitter
    story); param-compatible, exact. The discriminator's 64 -> 1 patch head
    is as narrow as the generator's, so its inference surfaces
    (make_discriminate_fn patch maps, models/export.py) get the same swap.
    Shared by generate_core, models/export.py, and the serving benchmark.
    """
    infer_head = getattr(config, "infer_head_conv", "train")
    if infer_head != "train" and infer_head != config.head_conv:
        models = models._replace(
            generator=models.generator.clone(head_conv=infer_head),
            discriminator=models.discriminator.clone(head_conv=infer_head),
        )
    return models


def generate_core(config: Config, models: Models, *, mesh=None) -> Callable:
    """Unjitted inference core mirroring Pix2PixModel.generate
    (pix2pix_model.py:58-60) and Pix2PixIndexedModel.generate (:283-287).

    RGBA: normalized source -> [-1, 1] fake image.
    Indexed: index-map source -> int32 index map via argmax.
    Dropout stays ACTIVE (training=True in every reference generate call).
    Shared by the single-device jit (make_generate_fn) and the DP-sharded
    jit (parallel.dp.make_dp_generate_fn, which binds `mesh`) so both
    compute the same function.

    config.infer_head_conv selects an inference-only head-conv lowering
    (networks.py::NCHWOutConv) applied to the SAME params — in a program
    with no backward pass XLA hands the narrow head a degenerate emitter
    (11.4 ms of a 21 ms batch-1024 forward on v5e; see the module docstring).
    """
    models = inference_models(config, models)

    def generate(g_params, source, rng):
        # same dropout-PRNG selection as the train steps, plus the serving
        # batch gate: under config "rbg" the hardware RBG applies only up to
        # RBG_GENERATE_MAX_BATCH (measured crossover; large batches keep
        # threefry) and never under a mesh. source.shape is trace-static,
        # so the selection costs nothing at run time.
        rng = _dropout_key(config, rng, mesh=mesh, batch=source.shape[0])
        if config.is_indexed:
            # argmax over logits == argmax over softmax(logits), skipping the
            # (B, H, W, 256) probability tensor (pix2pix_model.py:283-287)
            logits = _apply_generator_logits(
                models, g_params, source.astype(jnp.float32), rng
            )
            return jnp.argmax(logits, axis=-1)[..., None].astype(jnp.int32)
        return _apply_generator(models, g_params, source, rng)

    return generate


def make_generate_fn(config: Config, models: Models) -> Callable:
    """Jitted single-device inference (see generate_core)."""
    return jax.jit(generate_core(config, models))


def make_discriminate_fn(config: Config, models: Models) -> Callable:
    """Jitted patch-probability map for debugging visualizations
    (pix2pix_model.py:161-178). Backward-free, so the inference head
    lowering applies (see inference_models)."""
    models = inference_models(config, models)

    def discriminate(d_params, target, source):
        logits = _apply_discriminator(models, d_params, target, source)
        return jax.nn.sigmoid(logits)

    return jax.jit(discriminate)
