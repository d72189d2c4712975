"""The full training driver (reference: experiments/train.py:127-588).

Host-side imperative shell around the pure jitted train step: mixed
MPE + audio-only batch composition, cosine warmup x plateau decay,
checkpoint-every-N-batches with validation sweeps, best-model tracking and
early stopping. Data parallelism is applied by passing a mesh. Config is a
dataclass dumped to JSON in the run directory (the sacred-equivalent run
record, SURVEY.md §5.6).
"""

import dataclasses
import json
import math
import os
import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..data import constants
from ..data.loader import device_prefetch
from ..eval.evaluation import evaluate
from ..parallel import make_mesh, plan_local_rows, shard_global_batch
from .checkpoint import save_checkpoint
from .schedules import PlateauDecay, cosine_warmup
from .step import (TrainConfig, compact_audio, compact_ground_truth,
                   init_train_state, make_train_step, shard_train_step)

__all__ = ["TrainerConfig", "Trainer"]


@dataclass
class TrainerConfig:
    """Run-level hyperparameters (reference train.py:29-124)."""

    max_epochs: int = 5000
    checkpoint_interval: int = 250
    batch_size: int = 8
    n_secs: float = 9.0
    learning_rate: float = 1e-3
    multipliers: dict = field(default_factory=lambda: {
        "reconstruction": 1, "transcription": 1, "consistency": 1})
    n_epochs_warmup: int = 50
    validation_criteria_set: str = "URMP"
    validation_criteria_metric: str = "mpe/f1-score"
    validation_criteria_maximize: bool = True
    n_epochs_late_start: int = 0
    n_epochs_decay: int = 500
    n_epochs_cooldown: int = 100
    n_epochs_early_stop: Optional[int] = None
    n_devices: Optional[int] = None  # None = single device, no mesh
    # Conv backend for the train step: "flax" (NHWC modules), "packed"
    # (banded f-major forward, models/fused.py — fits the reference batch
    # recipe in single-chip HBM), "pallas" (fused kernels + custom-VJP
    # backward, the fast path), or "pallas_bf16" (mixed precision: bf16
    # level storage, f32 accumulation).
    conv_backend: str = "flax"
    # Optimizer surface (reference train.py:334: torch AdamW defaults).
    weight_decay: float = 0.01
    # Average gradients over k step() calls before applying the update —
    # reaches the reference global batch on fewer chips when HBM bounds the
    # per-step batch.
    grad_accum_steps: int = 1
    # Quantize batch uploads (audio -> int16 on a fixed ±8 grid, ground
    # truth -> uint8/255; dequantized on device) so the host->device
    # transfer hides under the device step on tunneled runtimes. Exact for
    # {0,1} ground truth; q <= 2.4e-4 on audio.
    compact_uploads: bool = True
    seed: int = 2
    root_dir: str = "runs"

    def dump(self, path):
        with open(path, "w") as fh:
            json.dump(dataclasses.asdict(self), fh, indent=2, default=str)


class Trainer:
    """Imperative training shell; all device math lives in the train step."""

    def __init__(self, model, mpe_loader, audio_loader, validation_sets,
                 config: TrainerConfig, writer=None):
        self.model = model
        self.mpe_loader = mpe_loader
        self.audio_loader = audio_loader
        self.validation_sets = validation_sets
        self.config = config
        self.writer = writer

        os.makedirs(config.root_dir, exist_ok=True)
        self.log_dir = os.path.join(config.root_dir, "models")
        os.makedirs(self.log_dir, exist_ok=True)
        config.dump(os.path.join(config.root_dir, "config.json"))
        # Sacred-parity run record (reference experiments/train.py:124 —
        # FileStorageObserver folders carry config.json, run.json,
        # metrics.json and _sources/ copies of the executed code).
        self._metrics_log = {}
        self._write_run_record()
        self._snapshot_sources()

        self.mpe_batch_size = mpe_loader.batch_size
        self.epoch_steps = len(mpe_loader)
        if audio_loader is not None:
            self.epoch_steps = min(self.epoch_steps, len(audio_loader))

        c = config
        self.n_ckpt_cooldown = math.ceil(
            c.n_epochs_cooldown * self.epoch_steps / c.checkpoint_interval)
        self.n_ckpt_decay = math.ceil(
            c.n_epochs_decay * self.epoch_steps / c.checkpoint_interval)
        self.n_ckpt_early_stop = None if c.n_epochs_early_stop is None else \
            math.ceil(c.n_epochs_early_stop * self.epoch_steps
                      / c.checkpoint_interval)

        self.warmup = cosine_warmup(c.n_epochs_warmup * self.epoch_steps)
        self.plateau = PlateauDecay(patience=self.n_ckpt_decay,
                                    cooldown=self.n_ckpt_cooldown,
                                    maximize=c.validation_criteria_maximize)

        self.mesh = make_mesh(c.n_devices) if c.n_devices else None

        # Multi-host pods: each process loads only its rows of the global
        # batch (O(1/n_processes) host-side decode/rasterize; VERDICT r3
        # weak #3). The plan tells the loaders which batch positions to
        # materialize and _compose_batch which loaded rows feed the audio
        # vs ground-truth shards; _transfer then assembles the global
        # arrays from the local rows (shard_global_batch(local=True)).
        self._local_plan = None
        if jax.process_count() > 1:
            if self.mesh is None:
                raise ValueError(
                    "multi-process training requires n_devices (a mesh "
                    "spanning the global devices)")
            audio_bs = audio_loader.batch_size if audio_loader else 0
            self._local_plan = plan_local_rows(self.mpe_batch_size, audio_bs)
            mpe_loader.batch_rows = self._local_plan.mpe_rows
            if audio_loader is not None:
                audio_loader.batch_rows = self._local_plan.audio_rows

        self._steps = {}
        self.params, self.opt_state = init_train_state(
            model, self._train_config(transcription_active=True))
        self.batch_count = 0
        self.best_results = None
        self.best_checkpoint = None
        self.n_ckpt_elapsed = 0

    # ------------------------------------------------------------------ #

    def _write_run_record(self):
        """run.json: invocation + environment (sacred run.json parity)."""
        import sys

        record = {
            "argv": list(sys.argv),
            "start_time": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "python": sys.version.split()[0],
            "jax": jax.__version__,
            "backend": jax.default_backend(),
            "n_devices": jax.device_count(),
        }
        with open(os.path.join(self.config.root_dir, "run.json"), "w") as fh:
            json.dump(record, fh, indent=2)

    def _snapshot_sources(self):
        """Copy the executed sources into ``_sources/`` (sacred parity:
        the reference's run folders carry the exact code that produced the
        run). Snapshots the entry script and the ``timbre_trap_tpu``
        package .py files; skipped if the snapshot already exists (resume
        into the same run directory)."""
        import shutil
        import sys

        dst = os.path.join(self.config.root_dir, "_sources")
        if os.path.isdir(dst):
            return
        os.makedirs(dst)
        script = sys.argv[0] if sys.argv else None
        if script and os.path.isfile(script):
            shutil.copy2(script, os.path.join(dst, os.path.basename(script)))
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        for root, _, files in os.walk(pkg_root):
            rel = os.path.relpath(root, os.path.dirname(pkg_root))
            for f in files:
                if f.endswith(".py"):
                    os.makedirs(os.path.join(dst, rel), exist_ok=True)
                    shutil.copy2(os.path.join(root, f),
                                 os.path.join(dst, rel, f))

    def _record_metrics(self, results_by_set):
        """Append validation metrics to metrics.json (sacred format:
        {name: {"steps": [...], "values": [...]}}), one point per
        checkpoint sweep."""
        for set_name, results in results_by_set.items():
            for key, value in results.items():
                entry = self._metrics_log.setdefault(
                    f"{set_name}/{key}", {"steps": [], "values": []})
                entry["steps"].append(self.batch_count)
                entry["values"].append(float(value))
        with open(os.path.join(self.config.root_dir, "metrics.json"),
                  "w") as fh:
            json.dump(self._metrics_log, fh, indent=2)

    def _train_config(self, transcription_active):
        m = self.config.multipliers
        return TrainConfig(
            learning_rate=self.config.learning_rate,
            weight_decay=self.config.weight_decay,
            grad_accum_steps=self.config.grad_accum_steps,
            multiplier_reconstruction=m.get("reconstruction", 1),
            multiplier_transcription=m.get("transcription", 1),
            multiplier_consistency=m.get("consistency", 1),
            transcription_active=transcription_active,
        )

    def _get_step(self, transcription_active):
        """Jitted (and optionally sharded) step per late-start phase."""
        key = bool(transcription_active)
        if key not in self._steps:
            backend = self.config.conv_backend
            cfg = self._train_config(key)
            # pallas + mesh: each fused level runs under shard_map over the
            # data axis (per-device Pallas grids, replicated weights) —
            # 8-device parity tested in tests/test_train.py.
            step = make_train_step(self.model, cfg, self.mpe_batch_size,
                                   conv_backend=backend, mesh=self.mesh,
                                   compact_audio_grid=True)
            if self.mesh is not None:
                self._steps[key] = shard_train_step(step, self.mesh)
            else:
                self._steps[key] = jax.jit(step)
        return self._steps[key]

    # ---------------------------- resume ------------------------------- #

    def _trainer_state(self):
        """Host-side scalars the step checkpoint does not carry — plateau
        decay progress, best tracking, early-stop counter. The reference
        loses all of these on restart (train.py:153-164); persisting them
        makes resume exact."""
        p = self.plateau
        return {
            "batch_count": self.batch_count,
            "plateau": {"scale": p.scale, "best": p.best,
                        "num_bad": p.num_bad,
                        "cooldown_counter": p.cooldown_counter},
            "best_checkpoint": self.best_checkpoint,
            "best_results": self.best_results,
            "n_ckpt_elapsed": self.n_ckpt_elapsed,
        }

    def restore(self, ckpt_path):
        """Resume exactly from a trainer checkpoint directory.

        Restores params/opt_state/step plus the trainer-state JSON saved
        next to it; a resumed ``run()`` then bit-matches an uninterrupted
        one (given deterministic loaders) — tested across a checkpoint
        boundary in tests/test_loop.py.
        """
        from .checkpoint import load_checkpoint

        state = load_checkpoint(
            ckpt_path, target={"params": self.params,
                               "opt_state": self.opt_state, "step": 0})
        self.params, self.opt_state = state["params"], state["opt_state"]
        self.batch_count = int(state["step"])
        self.model.params = self.params

        meta_path = f"{ckpt_path}.trainer.json"
        if os.path.exists(meta_path):
            with open(meta_path) as fh:
                meta = json.load(fh)
            self.batch_count = int(meta["batch_count"])
            pl = meta["plateau"]
            self.plateau.scale = float(pl["scale"])
            self.plateau.best = pl["best"]
            self.plateau.num_bad = int(pl["num_bad"])
            self.plateau.cooldown_counter = int(pl["cooldown_counter"])
            self.best_checkpoint = meta["best_checkpoint"]
            self.best_results = meta["best_results"]
            self.n_ckpt_elapsed = int(meta["n_ckpt_elapsed"])
        return self.batch_count

    def _compose_batch(self, data_mpe, data_audio):
        """Host-side numpy composition of one training batch.

        Runs on the prefetch thread. With ``compact_uploads`` (default) the
        batch is quantized for transfer — audio to int16 on a fixed ±8 grid
        (covers summed-stem mixes; q ≈ 2.4e-4) and the [0,1] ground-truth
        raster to uint8 — cutting the reference-recipe upload from 72 MB to
        16.4 MB per batch. Uploads serialize with device execution on
        tunneled runtimes, so the savings shorten step wall time directly;
        the train step dequantizes on device (train/step.py), keeping the
        {0,1} endpoints exact for the positive-class weighting.
        """
        mpe_audio = np.asarray(data_mpe[constants.KEY_AUDIO], np.float32)
        gt = np.asarray(data_mpe[constants.KEY_GROUND_TRUTH], np.float32)
        if self._local_plan is not None:
            # The loaders delivered only this process's rows (batch_rows);
            # route them to the shards they feed: the audio array's local
            # slice is [this host's MPE audio rows | its audio-only rows]
            # (global order preserved), the ground-truth slice is gt_pos.
            plan = self._local_plan
            parts = [mpe_audio[plan.mpe_audio_pos]]
            if data_audio:  # {} sentinel = audio loader had no local rows
                parts.append(np.asarray(data_audio[constants.KEY_AUDIO],
                                        np.float32))
            audio = np.concatenate(parts, axis=0)
            gt = gt[plan.gt_pos]
        else:
            audio = mpe_audio
            if data_audio:
                audio = np.concatenate(
                    [audio, np.asarray(data_audio[constants.KEY_AUDIO],
                                       np.float32)], axis=0)
        if self.config.compact_uploads:
            audio = compact_audio(audio)
            gt = compact_ground_truth(gt)
        return audio, gt

    def _transfer(self, batch):
        """Host batch -> device arrays.

        MUST run on the MAIN thread: on tunneled TPU runtimes a
        device->host fetch (metrics logging, validation) deadlocks while
        a device_put issued from another thread is still unconsumed
        (measured; see .claude/skills/verify/SKILL.md). device_put is
        asynchronous, so issuing batch k+1's transfer right after
        dispatching the step on batch k still overlaps upload with device
        compute — without any cross-thread device traffic."""
        audio, gt = batch
        if self.mesh is not None:
            # Process-aware: on multi-host pods each process contributes
            # only its local_batch_slice rows of the global batch — which
            # _compose_batch already reduced to local rows when a
            # _local_plan is active (O(1/n) host loading).
            return shard_global_batch(self.mesh, (audio, gt),
                                      local=self._local_plan is not None)
        return jax.device_put(audio), jax.device_put(gt)

    def _epoch_batches(self, epoch, start_epoch, skip_batches):
        """Composed host batches for one epoch (resume-aware skipping).

        With a dual loader the epoch truncates to the SHORTER loader
        (reference ``zip(loader, audio_loader)``, train.py:388) — never
        emit an MPE-only batch mid-epoch, which would silently change the
        batch shape (jit retrace, mesh-divisibility failures) and desync
        ``batch_count`` from ``epoch_steps``'s resume/warmup math.
        """
        audio_iter = iter(self.audio_loader) if self.audio_loader else None
        for i, data_mpe in enumerate(self.mpe_loader):
            if i >= self.epoch_steps:
                break
            data_audio = next(audio_iter, None) if audio_iter else None
            if audio_iter is not None and data_audio is None:
                break  # audio loader exhausted early (shorter than advertised)
            if epoch == start_epoch and i < skip_batches:
                continue
            yield self._compose_batch(data_mpe, data_audio)

    def _log(self, metrics):
        if self.writer is None:
            return
        for key, value in metrics.items():
            self.writer.add_scalar(f"train/{key}", float(value),
                                   self.batch_count)

    # ------------------------------------------------------------------ #

    def run(self):
        """Full training run; returns (best_checkpoint, best_results).

        Safe to call after :meth:`restore`: completed epochs are skipped and
        the first resumed epoch fast-forwards past the batches already
        trained (loaders are re-iterated, so exactness additionally needs
        per-epoch-deterministic loaders)."""
        c = self.config
        early_stop = False
        start_epoch = self.batch_count // self.epoch_steps
        skip_batches = self.batch_count % self.epoch_steps

        for epoch in range(start_epoch, c.max_epochs):
            transcription_active = epoch >= c.n_epochs_late_start
            step_fn = self._get_step(transcription_active)

            # Key each loader's shuffle by (seed, epoch): a resumed run then
            # reshuffles epoch k exactly as the uninterrupted run did —
            # with a process-lifetime RNG the resume guarantee silently
            # degraded across epoch boundaries (VERDICT r3 weak #7). Also
            # what keeps the global order identical across pod hosts.
            for loader in (self.mpe_loader, self.audio_loader):
                if loader is not None and hasattr(loader, "set_epoch"):
                    loader.set_epoch(epoch)

            # Batch composition rides a prefetch thread (host work only);
            # the main thread issues batch k+1's asynchronous device_put
            # right after dispatching the step on batch k, so the upload
            # overlaps device compute (VERDICT r2 #5; reference overlap:
            # DataLoader workers + pin_memory). Device transfers must stay
            # on the main thread — see _transfer.
            batches = device_prefetch(
                self._epoch_batches(epoch, start_epoch, skip_batches),
                depth=2)
            try:
                nxt = next(batches, None)
                dev = self._transfer(nxt) if nxt is not None else None
                while dev is not None:
                    audio, gt = dev
                    self.batch_count += 1

                    # host-side schedule math: no device round trip per step
                    lr = c.learning_rate * float(
                        self.warmup(self.batch_count - 1))
                    lr *= self.plateau.scale

                    self.params, self.opt_state, metrics = step_fn(
                        self.params, self.opt_state, audio, gt,
                        jnp.float32(lr))
                    nxt = next(batches, None)
                    dev = self._transfer(nxt) if nxt is not None else None
                    self._log(metrics)

                    if self.batch_count % c.checkpoint_interval == 0:
                        self.n_ckpt_elapsed = self._checkpoint_and_validate(
                            epoch, self.n_ckpt_elapsed)
                        if (self.n_ckpt_early_stop is not None
                                and self.n_ckpt_elapsed
                                >= self.n_ckpt_early_stop):
                            early_stop = True
                            break
            finally:
                batches.close()
            if early_stop:
                break

        return self.best_checkpoint, self.best_results

    def _checkpoint_and_validate(self, epoch, n_ckpt_elapsed):
        c = self.config
        self.model.params = self.params  # sync inference paths
        # Make every run's checkpoints self-describing: downstream CLIs
        # (evaluate/comparison/sonify/latents) rebuild the exact trained
        # configuration — variant, skip_connections, transform — via
        # models.load_model, which reads this run-level hparams.json
        # (the capability the reference gets from whole-module
        # torch.save, train.py:506-511).
        hparams_path = os.path.join(self.log_dir, "hparams.json")
        if not os.path.isfile(hparams_path):
            with open(hparams_path, "w") as fh:
                json.dump(self.model.hparams, fh, indent=2)
        ckpt_path = os.path.join(self.log_dir, f"model-{self.batch_count}")
        save_checkpoint(ckpt_path, self.params, self.opt_state,
                        self.batch_count)
        n_ckpt_elapsed = self._validate_and_track(epoch, n_ckpt_elapsed)
        # Persist the host-side trainer scalars next to the step checkpoint
        # AFTER plateau/best updates so restore() resumes exactly.
        self.n_ckpt_elapsed = n_ckpt_elapsed
        with open(f"{ckpt_path}.trainer.json", "w") as fh:
            json.dump(self._trainer_state(), fh, indent=2, default=float)
        return n_ckpt_elapsed

    def _validate_and_track(self, epoch, n_ckpt_elapsed):
        c = self.config

        validation_results = {}
        for val_set in self.validation_sets:
            validation_results[val_set.name()] = evaluate(
                model=self.model, eval_set=val_set,
                multipliers=c.multipliers, writer=self.writer,
                i=self.batch_count)
        if validation_results:
            self._record_metrics(validation_results)

        warmup_active = self.batch_count < c.n_epochs_warmup * self.epoch_steps
        if (self.n_ckpt_decay and not warmup_active
                and epoch >= c.n_epochs_late_start and validation_results):
            score = validation_results[c.validation_criteria_set][
                c.validation_criteria_metric]
            self.plateau.step(score)

        current = validation_results.get(c.validation_criteria_set, {}).get(
            c.validation_criteria_metric)
        if current is not None:
            best = None if self.best_results is None else \
                self.best_results[c.validation_criteria_set][
                    c.validation_criteria_metric]
            improved = best is None or (
                current > best if c.validation_criteria_maximize
                else current < best)
            if improved:
                self.best_checkpoint = self.batch_count
                self.best_results = validation_results
                return 0
            return n_ckpt_elapsed + 1
        return n_ckpt_elapsed
