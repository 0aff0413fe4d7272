"""Training loop with evaluation callbacks, checkpoints, and TB logging.

Functional rebuild of the reference's S2SModel.fit/do_fit
(side2side_model.py:54-122): the training itself runs as fused on-device
chunks (make_train_chunk) of `update_steps` steps; between chunks the host
performs what the reference did every `update_steps` — preview grids,
discriminator patch debugging, L1/FID evaluation, scalar/image logging, ETA
printing — and checkpoints every update_steps*5 and at the end. Restore
actually works (the reference never wired checkpoint.restore; SURVEY.md §5).

Callbacks use the reference's names: "show_discriminator_output",
"evaluate_l1", "evaluate_fid" (side2side_model.py:95-107).
"""

from __future__ import annotations

import os
import time
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.loader import (
    IndexedDataset,
    RgbaDataset,
    make_indexed_datasets,
    make_rgba_datasets,
)
from ..eval import metrics as eval_metrics
from ..ops.image import normalize
from ..ops.palette import indexed_to_rgba
from ..utils import logging as log_utils
from ..utils import visualization as viz
from ..utils.io import seconds_to_human_readable
from . import checkpoint as ckpt_mod
from .state import Models, TrainState, build_models, create_train_state, param_count
from .steps import make_discriminate_fn, make_generate_fn, make_train_chunk


def show_eta(
    training_start_time, step_start_time, current_step, starting_step, total_steps,
    update_steps,
):
    """ETA printer (side2side_model.py:14-25)."""
    now = time.time()
    elapsed = now - training_start_time
    steps_so_far = float(current_step - starting_step)
    elapsed_per_step = elapsed / (steps_so_far + 1.0)
    remaining_steps = total_steps - steps_so_far
    eta = elapsed_per_step * remaining_steps
    print(f"Time since start: {seconds_to_human_readable(elapsed)}")
    print(f"Estimated time to finish: {seconds_to_human_readable(eta)}")
    print(f"Last {update_steps} steps took: {now - step_start_time:.2f}s\n")


class Trainer:
    """End-to-end training driver for any of the four model variants."""

    def __init__(self, config: Config, fid_evaluator=None):
        self.config = config
        self.models: Models = build_models(config)
        if config.is_indexed:
            self.train_ds, self.test_ds = make_indexed_datasets(config)
        else:
            self.train_ds, self.test_ds = make_rgba_datasets(config)

        rng = jax.random.PRNGKey(config.seed)
        self.data_key, init_key = jax.random.split(rng)
        self.state: TrainState = create_train_state(config, self.models, init_key)
        print(
            f"Generator: unet-gen with {param_count(self.state.g_params):,} parameters"
        )
        print(
            f"Discriminator: patch-disc with {param_count(self.state.d_params):,} parameters"
        )

        # data parallelism: shard the training batch over all visible devices
        # (SURVEY.md §2.3 — the reference is single-device; here a >1-device
        # mesh is picked up automatically, or forced with data_parallel="on")
        self.mesh = None
        ndev = len(jax.devices())
        dp_mode = getattr(config, "data_parallel", "auto")
        if dp_mode == "on" or (
            dp_mode == "auto" and ndev > 1 and config.batch_size % ndev == 0
        ):
            from ..parallel import dp as dp_mod
            from ..parallel import mesh as mesh_mod

            self.mesh = mesh_mod.make_mesh(data_axis=config.data_axis)
            self.state = mesh_mod.replicate_state(self.mesh, self.state)
            self.train_chunk = dp_mod.make_dp_train_chunk(
                config, self.models, self.mesh, self.train_ds.n
            )
            print(
                f"Data-parallel mesh over {ndev} devices "
                f"(batch {config.batch_size} -> {config.batch_size // ndev}/device)"
            )
        else:
            self.train_chunk = make_train_chunk(config, self.models, self.train_ds.n)
        if self.mesh is not None:
            # evaluation/preview generate work rides the mesh too
            # (side2side_model.py:144-160 under BASELINE.json config 5);
            # pad-and-slice keeps it bit-equal to the single-device path
            from ..parallel import dp as dp_mod

            self.generate_fn = dp_mod.make_dp_generate_fn(
                config, self.models, self.mesh
            )
        else:
            self.generate_fn = make_generate_fn(config, self.models)
        self.discriminate_fn = make_discriminate_fn(config, self.models)
        self.manager = ckpt_mod.make_manager(config)
        self._saver = ckpt_mod.AsyncSaver(self.manager)
        self.writer = None
        self.now_string = None
        self._fid = fid_evaluator
        # wall-time per fit phase, accumulated across the run (the reference
        # only prints ETA; this answers "where did the schedule's time go" —
        # train chunks vs previews vs L1/FID vs checkpoints vs TB writes)
        self.phase_seconds: dict[str, float] = {}

    def _phase(self, name: str):
        """Context manager accumulating wall time into phase_seconds[name]."""
        import contextlib

        @contextlib.contextmanager
        def timer():
            t0 = time.time()
            try:
                yield
            finally:
                self.phase_seconds[name] = (
                    self.phase_seconds.get(name, 0.0) + time.time() - t0
                )

        return timer()

    # -- dataset arrays handed to the scan (sources, targets) ---------------
    def _chunk_dataset(self):
        dataset = (self.train_ds.sources, self.train_ds.targets)
        if self.mesh is not None:
            from ..parallel import mesh as mesh_mod

            sharding = mesh_mod.replicated(self.mesh)
            dataset = jax.tree.map(
                lambda x: jax.device_put(x, sharding), dataset
            )
        return dataset

    # ----------------------------------------------------------------------
    def fit(
        self,
        steps: int | None = None,
        update_steps: int | None = None,
        callbacks: Sequence[str] = (),
        starting_step: int = 0,
    ):
        config = self.config
        steps = config.steps if steps is None else steps
        update_steps = config.update_steps if update_steps is None else update_steps

        if starting_step == 0 or self.writer is None:
            self.writer, self.now_string = log_utils.make_writer(config)
        try:
            self._do_fit(steps, update_steps, callbacks, starting_step)
        finally:
            # Durability on the exception path: a crash mid-chunk must not
            # lose a checkpoint whose snapshot already landed — without this
            # the lagged write leaves the latest durable checkpoint up to two
            # cadences stale. Guarded so a flush failure (e.g. the tunnel
            # outage that caused the crash) can't mask the original error.
            try:
                self._saver.flush()
            except Exception as e:
                print(f"checkpoint flush on exit failed: {e!r}")
            self.writer.flush()

    def _do_fit(self, steps, update_steps, callbacks, starting_step):
        config = self.config
        examples = self.select_examples_for_visualization()
        training_start = time.time()
        step_start = training_start

        dataset = self._chunk_dataset()
        done = 0
        # initial visualization at step 0 (side2side_model.py:78)
        self._update_visualization(examples, starting_step, update_steps, callbacks)

        while done < steps:
            chunk = min(update_steps, steps - done)
            with self._phase("train_chunk"):
                self.state, metrics = self.train_chunk(
                    self.state, dataset, self.data_key, chunk
                )
                # the chunk dispatch is async; fetching the metrics to host
                # blocks on the device work, so it belongs to this phase
                host_metrics = {k: np.asarray(v) for k, v in metrics.items()}
            done += chunk
            current_step = int(self.state.step)

            # per-step scalars at the reference's quantized step
            # (pix2pix_model.py:85-89 writes every step at step//update_steps)
            with self._phase("scalar_logging"):
                start = current_step - chunk
                for i in range(chunk):
                    qstep = log_utils.quantize_step(start + i, update_steps)
                    self.writer.scalars(
                        {k: float(v[i]) for k, v in host_metrics.items()}, qstep
                    )

            show_eta(
                training_start, step_start, current_step, starting_step,
                steps, update_steps,
            )
            step_start = time.time()
            self._update_visualization(examples, current_step, update_steps, callbacks)

            # reference cadence: checkpoint every update_steps*5 and at the
            # end (side2side_model.py:121-122); the saver snapshots on
            # device and lets the transfer + write ride behind the next
            # chunks, so only the post-loop flush ever blocks
            if current_step % (update_steps * 5) == 0 or done >= steps:
                with self._phase("checkpoint"):
                    self._saver.save(self.state)

        with self._phase("checkpoint"):
            self._saver.flush()

        total = sum(self.phase_seconds.values())
        if total > 0:
            breakdown = "  ".join(
                f"{k} {v:.1f}s ({100 * v / total:.0f}%)"
                for k, v in sorted(
                    self.phase_seconds.items(), key=lambda kv: -kv[1]
                )
            )
            print(f"Phase breakdown: {breakdown}")

    # ----------------------------------------------------------------------
    def _update_visualization(self, examples, step, update_steps, callbacks):
        config = self.config
        save_name = os.path.join(
            config.temp_folder, "logs", config.architecture_name, config.model,
            self.now_string or "run", f"step_{step:06d}.png",
        )
        print(f"Previewing images generated at step {step} (3 test + 3 train)...")
        with self._phase("preview"):
            image = self.preview_generated_images(examples, save_name, step)
            self.writer.image(
                save_name, image, log_utils.quantize_step(step, update_steps)
            )

        if "show_discriminator_output" in callbacks:
            print("Showing discriminator output patches (2 test + 2 train)...")
            # the reference DISPLAYS these patch maps inline
            # (pix2pix_model.py:161-229 via side2side_model.py:228-238); in a
            # CLI context they land next to the preview grids: PNGs in the
            # logs folder + TB images at the quantized step
            with self._phase("discriminator_debug"):
                qstep = log_utils.quantize_step(step, update_steps)
                run_dir = os.path.dirname(save_name)
                for split in ("test", "train"):
                    prefix = os.path.join(
                        run_dir, f"discriminated_{split}_step_{step:06d}"
                    )
                    for i, img in enumerate(
                        self.show_discriminated_images(
                            split, 2, save_prefix=prefix
                        )
                    ):
                        self.writer.image(f"{prefix}_{i}.png", img, qstep)
        if "evaluate_l1" in callbacks:
            with self._phase("evaluate_l1"):
                l1_train, l1_test = self.report_l1(
                    step=log_utils.quantize_step(step, update_steps)
                )
            print(f"L1: {l1_train:.5f} / {l1_test:.5f} (train/test)")
        if "evaluate_fid" in callbacks:
            with self._phase("evaluate_fid"):
                fid_train, fid_test = self.report_fid(
                    step=log_utils.quantize_step(step, update_steps)
                )
            print(f"FID: {fid_train:.3f} / {fid_test:.3f} (train/test)")

    # -- example selection (pix2pix_model.py:103-110) -----------------------
    def select_examples_for_visualization(self, number_of_examples: int = 6):
        num_train = number_of_examples // 2
        num_test = number_of_examples - num_train
        if self.config.is_indexed:
            test = [
                (self.test_ds.sources[i], self.test_ds.targets[i], self.test_ds.palettes[i])
                for i in range(num_test)
            ]
            train = [
                (self.train_ds.sources[i], self.train_ds.targets[i], self.train_ds.palettes[i])
                for i in range(num_train)
            ]
        else:
            test = [
                (self.test_ds.sources[i], self.test_ds.targets[i])
                for i in range(num_test)
            ]
            train = [
                (self.train_ds.sources[i], self.train_ds.targets[i])
                for i in range(num_train)
            ]
        return test + train

    # -- preview grid -------------------------------------------------------
    def preview_generated_images(self, examples, save_name=None, step=None):
        config = self.config
        rng = jax.random.fold_in(jax.random.PRNGKey(config.seed), max(step or 0, 0))
        if config.is_indexed:
            src = np.stack([np.asarray(e[0]) for e in examples])
            tgt = np.stack([np.asarray(e[1]) for e in examples])
            pals = np.stack([np.asarray(e[2]) for e in examples])
            fake_idx = np.asarray(self.generate_fn(self.state.g_params, src, rng))
            decode = jax.vmap(indexed_to_rgba)
            sources = np.asarray(decode(src, pals))
            targets = np.asarray(decode(tgt, pals))
            gen = np.asarray(decode(fake_idx, pals))
            return viz.preview_grid(
                sources, targets, gen, save_name, step, values_in_unit_range=True
            )
        src_raw = np.stack([np.asarray(e[0]) for e in examples])
        tgt_raw = np.stack([np.asarray(e[1]) for e in examples])
        src = np.asarray(normalize(src_raw))
        tgt = np.asarray(normalize(tgt_raw))
        fake = np.asarray(self.generate_fn(self.state.g_params, src, rng))
        return viz.preview_grid(src, tgt, fake, save_name, step)

    # -- discriminator patch debug (pix2pix_model.py:161-229) ---------------
    def show_discriminated_images(
        self,
        dataset_name: str = "test",
        num_images: int = 2,
        save_prefix: str | None = None,
    ):
        ds = self.test_ds if dataset_name == "test" else self.train_ds
        config = self.config
        rng = jax.random.PRNGKey(config.seed + 1)
        outputs = []
        for i in range(num_images):
            save_name = f"{save_prefix}_{i}.png" if save_prefix else None
            if config.is_indexed:
                src = np.asarray(ds.sources[i : i + 1])
                tgt = np.asarray(ds.targets[i : i + 1])
                pal = np.asarray(ds.palettes[i])
                fake = np.asarray(self.generate_fn(self.state.g_params, src, rng))
                real_p = np.asarray(
                    self.discriminate_fn(
                        self.state.d_params,
                        tgt.astype(np.float32),
                        src.astype(np.float32),
                    )
                )[0]
                fake_p = np.asarray(
                    self.discriminate_fn(
                        self.state.d_params,
                        fake.astype(np.float32),
                        src.astype(np.float32),
                    )
                )[0]
                img = viz.discriminator_debug_figure(
                    np.asarray(indexed_to_rgba(src[0], pal)),
                    np.asarray(indexed_to_rgba(tgt[0], pal)),
                    np.asarray(indexed_to_rgba(fake[0], pal)),
                    real_p,
                    fake_p,
                    save_name=save_name,
                    values_in_unit_range=True,
                )
            else:
                src = np.asarray(normalize(ds.sources[i : i + 1]))
                tgt = np.asarray(normalize(ds.targets[i : i + 1]))
                fake = np.asarray(self.generate_fn(self.state.g_params, src, rng))
                real_p = np.asarray(self.discriminate_fn(self.state.d_params, tgt, src))[0]
                fake_p = np.asarray(self.discriminate_fn(self.state.d_params, fake, src))[0]
                img = viz.discriminator_debug_figure(
                    src[0], tgt[0], fake[0], real_p, fake_p,
                    save_name=save_name,
                )
            outputs.append(img)
        return outputs

    # -- evaluation (side2side_model.py:144-176) ----------------------------
    def report_l1(self, num_images: int | None = None, step=None):
        # Default follows the config's test-split size (the reference derives
        # TEST_SIZE from its dataset configuration, configuration.py:17-20) —
        # not the module constant, which only matches the default datasets.
        if num_images is None:
            num_images = sum(self.config.test_sizes)
        rng = jax.random.PRNGKey(self.config.seed + 2)
        train_value, test_value = eval_metrics.report_l1(
            self.config, self.models, self.state,
            self.train_ds, self.test_ds, num_images, rng,
            gen_fn=self.generate_fn,
        )
        if self.writer is not None and step is not None:
            self.writer.scalars(
                {"l1-evaluation/train": train_value, "l1-evaluation/test": test_value},
                step,
            )
        return train_value, test_value

    def report_fid(self, num_images: int | None = None, step=None):
        if num_images is None:
            num_images = sum(self.config.test_sizes)
        if self._fid is None:
            from ..eval.fid import FidEvaluator

            self._fid = FidEvaluator(mesh=self.mesh)
        rng = jax.random.PRNGKey(self.config.seed + 3)
        k1, k2 = jax.random.split(rng)
        r_train, f_train = eval_metrics.generate_split(
            self.config, self.models, self.state, self.train_ds, num_images, k1,
            gen_fn=self.generate_fn,
        )
        r_test, f_test = eval_metrics.generate_split(
            self.config, self.models, self.state, self.test_ds, num_images, k2,
            gen_fn=self.generate_fn,
        )
        train_value = self._fid.compare(r_train, f_train)
        test_value = self._fid.compare(r_test, f_test)
        if self.writer is not None and step is not None:
            self.writer.scalars(
                {"fid/train": train_value, "fid/test": test_value}, step
            )
        return train_value, test_value

    # -- image dumps (side2side_model.py:202-222) ---------------------------
    def generate_images_from_dataset(
        self, dataset_name: str = "test", num_images: int | None = None, steps=None
    ):
        config = self.config
        ds = self.test_ds if dataset_name == "test" else self.train_ds
        n = ds.n if num_images is None else min(num_images, ds.n)
        base = os.path.join(
            config.temp_folder, "generated-images", config.architecture_name, config.model
        )
        from ..utils.io import delete_folder, ensure_folder_structure

        delete_folder(base)
        ensure_folder_structure(base)
        if config.is_indexed:
            examples = [
                (ds.sources[i], ds.targets[i], ds.palettes[i]) for i in range(n)
            ]
        else:
            examples = [(ds.sources[i], ds.targets[i]) for i in range(n)]
        for i, ex in enumerate(examples):
            self.preview_generated_images(
                [ex], os.path.join(base, f"{i}.png"), steps
            )
        print(f'Generated {n} images (using "{dataset_name}" dataset)')

    # -- save/load (side2side_model.py:178-200) -----------------------------
    def save_generator(self):
        return ckpt_mod.save_params(self.config, "generator", self.state.g_params)

    def load_generator(self):
        params = ckpt_mod.load_params(self.config, "generator", self.state.g_params)
        self.state = self.state.replace(g_params=params)

    def save_discriminator(self):
        return ckpt_mod.save_params(self.config, "discriminator", self.state.d_params)

    def load_discriminator(self):
        params = ckpt_mod.load_params(self.config, "discriminator", self.state.d_params)
        self.state = self.state.replace(d_params=params)

    def import_network_params(
        self, generator_npz: str = None, discriminator_npz: str = None
    ) -> None:
        """Load converted reference weights (models/convert.py npz files)
        into the live state, e.g. to fine-tune or generate from a model
        trained with the TF reference. Optimizer moments and the step
        counter reset to zero — this is a weight import, not a resume.
        """
        from ..models import convert

        def _adopt(tree, current, what):
            cur_flat = jax.tree_util.tree_leaves_with_path(current)
            new_flat = {
                jax.tree_util.keystr(p): leaf
                for p, leaf in jax.tree_util.tree_leaves_with_path(
                    jax.tree_util.tree_map(jnp.asarray, tree)
                )
            }
            out = []
            for path, cur in cur_flat:
                key = jax.tree_util.keystr(path)
                if key not in new_flat:
                    raise ValueError(f"{what}: missing param {key} in npz")
                leaf = new_flat.pop(key)
                if leaf.shape != cur.shape:
                    raise ValueError(
                        f"{what}: param {key} has shape {leaf.shape}, "
                        f"expected {cur.shape} — wrong variant?"
                    )
                out.append(leaf.astype(cur.dtype))
            if new_flat:
                raise ValueError(
                    f"{what}: unexpected extra params {sorted(new_flat)[:3]}"
                )
            return jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(current), out
            )

        state = self.state
        if generator_npz:
            g = _adopt(
                convert.load_params_npz(generator_npz), state.g_params, "generator"
            )
            state = state.replace(g_params=g, g_opt_state=self.models.g_tx.init(g))
        if discriminator_npz:
            d = _adopt(
                convert.load_params_npz(discriminator_npz),
                state.d_params,
                "discriminator",
            )
            state = state.replace(d_params=d, d_opt_state=self.models.d_tx.init(d))
        if generator_npz or discriminator_npz:
            state = state.replace(step=jnp.zeros_like(state.step))
        self.state = state
        if self.mesh is not None:
            from ..parallel import mesh as mesh_mod

            self.state = mesh_mod.replicate_state(self.mesh, self.state)

    def restore_latest_checkpoint(self) -> int:
        """Resume from the latest checkpoint; returns the restored step."""
        self.state = ckpt_mod.restore(self.manager, self.state)
        if self.mesh is not None:
            from ..parallel import mesh as mesh_mod

            self.state = mesh_mod.replicate_state(self.mesh, self.state)
        return int(self.state.step)
