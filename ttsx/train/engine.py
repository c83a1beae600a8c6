"""Unified three-stage training engine.

Re-designs train/engine/{trainer,loop,registry}.py + train/unified_trainer.py:
block registry, callback hooks, grad-accum, per-block optimizers, EMA
swap-validation, checkpoint cadence, and the `novel:` features
(sde_noise_annealing, dynamic_gan, ema_swap_validate — unified_full.yaml).

The loop itself is host-side python (like the reference's loop.py); every
step body is a jitted pure function from ttsx/train/blocks.py. Data
parallelism comes from sharding the batch over the mesh's dp axis before
calling the steps (ttsx/parallel).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ttsx.core.config import TTSXConfig
from ttsx.train.blocks import AcousticBlock, RefinerBlock, VocoderBlock


class Callback:
    """Hook interface (intent of the missing train/callbacks base class,
    re-imported at train/engine/registry.py:8)."""

    def on_train_start(self, trainer): ...
    def on_step_end(self, trainer, metrics: Dict): ...
    def on_validation_end(self, trainer, metrics: Dict): ...
    def on_checkpoint(self, trainer, step: int): ...
    def on_train_end(self, trainer): ...


class BlockRegistry:
    """Name -> block factory (train/engine/registry.py:27-31)."""
    _registry: Dict[str, Callable] = {}

    @classmethod
    def register(cls, name: str):
        def deco(fn):
            cls._registry[name] = fn
            return fn
        return deco

    @classmethod
    def create(cls, name: str, cfg: TTSXConfig):
        if name not in cls._registry:
            raise KeyError(f"unknown train block '{name}'")
        return cls._registry[name](cfg)


BlockRegistry.register("acoustic")(AcousticBlock)
BlockRegistry.register("refiner")(RefinerBlock)
BlockRegistry.register("vocoder")(VocoderBlock)


class TrainerState:
    """Mutable host-side view of the run (train/engine/state.py)."""

    def __init__(self):
        self.global_step = 0
        self.best_val = float("inf")
        self.noise_scale = 1.0     # novel: sde_noise_annealing
        self.l1_weight = 1.0       # refiner L1<->SDE blend anneal
        self.d_loss_ema = 1.0      # novel: dynamic_gan ratio
        self.g_loss_ema = 1.0
        self.oom_count = 0
        self.step_times: List[float] = []


class UnifiedTrainer:
    """UnifiedTrainer(config, train_loader, val_loader).train()
    (train/engine/trainer.py:18-63)."""

    def __init__(self, cfg: TTSXConfig, train_iter: Iterable[Dict],
                 val_iter: Optional[Iterable[Dict]] = None,
                 callbacks: Optional[List[Callback]] = None,
                 blocks: Iterable[str] = ("acoustic", "refiner", "vocoder"),
                 checkpoint_dir: Optional[str] = None,
                 mesh=None, observer=None):
        self.cfg = cfg
        self.train_iter = iter(train_iter)
        # val_iter may be a list/dataset (re-iterable), a factory callable,
        # or a one-shot generator — materialize generators once so every
        # validation pass sees the full set (a one-shot iterator would make
        # every pass after the first see zero batches -> val_l1=inf, which
        # sde_noise_annealing then turns into l1_weight=0.1)
        if val_iter is not None and not callable(val_iter) \
                and iter(val_iter) is val_iter:
            val_iter = list(val_iter)
        self.val_iter = val_iter
        self.callbacks = callbacks or []
        self.state = TrainerState()
        self.blocks: Dict[str, Any] = {
            name: BlockRegistry.create(name, cfg) for name in blocks}
        self.block_states: Dict[str, Any] = {}
        self.checkpoint_dir = checkpoint_dir
        # optional dp mesh: batches sharded on 'dp', states replicated —
        # the engine-level DDP analog (train/unified_trainer.py:78-101)
        self.mesh = mesh
        # observer pre-forward hook (ref loop.py:63,115,165-169 +
        # trainer.py:51-52): per-stage batch transform applied before
        # every stage's step in train AND validation
        self.observer = observer
        self._rng = jax.random.PRNGKey(cfg.train.seed)

    def _pre_forward(self, stage: str, batch: Dict,
                     training: bool = True) -> Dict:
        if self.observer is None:
            return batch
        return self.observer.pre_forward(stage, batch,
                                         step=self.state.global_step,
                                         training=training)

    def _place(self, batch: Dict) -> Dict:
        if self.mesh is None:
            return batch
        from ttsx.parallel import shard_batch_dp
        placed = shard_batch_dp(
            {k: v for k, v in batch.items() if hasattr(v, "shape")},
            self.mesh)
        out = dict(batch)
        out.update(placed)
        return out

    # -- setup ------------------------------------------------------------
    def init_states(self, batch: Dict):
        for name, block in self.blocks.items():
            self._rng, sub = jax.random.split(self._rng)
            self.block_states[name] = block.init_state(sub, batch)

    # -- one engine step (loop.py:55-106) ----------------------------------
    def train_step(self, batch: Dict) -> Dict:
        t0 = time.perf_counter()
        cfg = self.cfg.train
        batch = self._place(batch)
        metrics: Dict[str, float] = {}
        mel_pred = batch["mel"]

        if "acoustic" in self.blocks:
            if cfg.grad_accum_steps > 1:
                # collect A-1 more batches, stack, one accumulated step
                micro = [self._pre_forward("acoustic", batch)]
                for _ in range(cfg.grad_accum_steps - 1):
                    try:
                        micro.append(self._pre_forward(
                            "acoustic",
                            self._place(next(self.train_iter))))
                    except StopIteration:
                        break
                keys = [k for k in micro[0]
                        if hasattr(micro[0][k], "shape")]
                stacked = {k: jnp.stack([jnp.asarray(m[k]) for m in micro])
                           for k in keys}
                st, out = self.blocks["acoustic"].train_step_accum(
                    self.block_states["acoustic"], stacked)
            else:
                st, out = self.blocks["acoustic"].train_step(
                    self.block_states["acoustic"],
                    self._pre_forward("acoustic", batch))
            self.block_states["acoustic"] = st
            metrics.update({f"acoustic/{k}": float(v)
                            for k, v in out["metrics"].items()})
            mel_pred = jax.lax.stop_gradient(out["mel_pred"])

        if ("refiner" in self.blocks
                and self.state.global_step % cfg.refiner_update_freq == 0):
            st, out = self.blocks["refiner"].train_step(
                self.block_states["refiner"],
                self._pre_forward("refiner", batch), mel_pred,
                jnp.asarray(self.state.noise_scale, jnp.float32),
                jnp.asarray(self.state.l1_weight, jnp.float32))
            self.block_states["refiner"] = st
            metrics.update({f"refiner/{k}": float(v)
                            for k, v in out["metrics"].items()})

        if ("vocoder" in self.blocks
                and self.state.global_step >= cfg.vocoder_freeze_until
                and "wav" in batch):
            voc = self.blocks["vocoder"]
            vstate = self.block_states["vocoder"]
            vbatch = self._pre_forward("vocoder", batch)
            d_steps = self._dynamic_d_steps()
            try:
                for _ in range(d_steps):
                    vstate, dm = voc.disc_step(vstate, vbatch)
                vstate, gm = voc.gen_step(vstate, vbatch)
                self.block_states["vocoder"] = vstate
                d_l, g_l = float(dm["d_loss"]), float(gm["g_loss"])
                metrics["vocoder/d_loss"] = d_l
                metrics["vocoder/g_loss"] = g_l
                metrics["vocoder/d_steps"] = d_steps
                # loss EMAs drive the dynamic D:G ratio (loop.py:91-104)
                a = 0.9
                self.state.d_loss_ema = (a * self.state.d_loss_ema
                                         + (1 - a) * d_l)
                self.state.g_loss_ema = (a * self.state.g_loss_ema
                                         + (1 - a) * g_l)
            except RuntimeError as e:
                # OOM catch + skip step (unified_trainer.py:189-194;
                # state.oom_count at train/engine/state.py:11)
                if "RESOURCE_EXHAUSTED" not in str(e) and "OOM" not in str(e):
                    raise
                self.state.oom_count += 1
                metrics["vocoder/oom"] = self.state.oom_count

        self.state.global_step += 1
        dt = time.perf_counter() - t0
        self.state.step_times.append(dt)
        metrics["step_time_s"] = dt
        for cb in self.callbacks:
            cb.on_step_end(self, metrics)
        return metrics

    def _dynamic_d_steps(self) -> int:
        """novel: dynamic_gan — more D steps when D lags G."""
        if not self.cfg.train.novel.dynamic_gan:
            return self.cfg.train.gan_d_steps
        ratio = self.state.d_loss_ema / max(self.state.g_loss_ema, 1e-6)
        if ratio > 1.5:
            return min(self.cfg.train.gan_d_steps + 1, 3)
        if ratio < 0.5:
            return max(self.cfg.train.gan_d_steps - 1, 1)
        return self.cfg.train.gan_d_steps

    # -- validation (loop.py:139-163) --------------------------------------
    def validate(self) -> Dict:
        if self.val_iter is None:
            return {}
        if "acoustic" not in self.blocks and "refiner" not in self.blocks:
            return {}  # vocoder-only runs have no mel-L1 validation path
        use_ema = self.cfg.train.novel.ema_swap_validate
        vals = []
        batches = self.val_iter() if callable(self.val_iter) else self.val_iter
        for batch in batches:
            batch = self._place(batch)
            if "acoustic" in self.blocks:
                params = self.block_states["acoustic"].eval_params(use_ema)
                out = self.blocks["acoustic"].val_step(
                    params, self._pre_forward("acoustic", batch,
                                              training=False))
                mel_pred = out["mel_pred"]
            else:
                out = None
                mel_pred = batch["mel"]  # refiner-only: refine ground truth
            if "refiner" in self.blocks:
                rout = self.blocks["refiner"].val_step(
                    self.block_states["refiner"].eval_params(use_ema),
                    self._pre_forward("refiner", batch, training=False),
                    mel_pred)
                vals.append(float(rout["val_l1"]))
            else:
                vals.append(float(out["val_l1"]))
        val_l1 = float(np.mean(vals)) if vals else float("inf")
        metrics = {"val_l1": val_l1}
        # novel: sde_noise_annealing — noise scale tracks validation L1
        # (loop.py:47 refiner.update_noise_schedule(val_l1))
        if self.cfg.train.novel.sde_noise_annealing:
            self.state.noise_scale = float(np.clip(val_l1, 0.05, 1.0))
            self.state.l1_weight = float(np.clip(1.0 - val_l1, 0.1, 1.0))
        if val_l1 < self.state.best_val:
            self.state.best_val = val_l1
            metrics["best"] = True
        for cb in self.callbacks:
            cb.on_validation_end(self, metrics)
        return metrics

    # -- checkpoint --------------------------------------------------------
    def save_checkpoint(self, tag: str = "last"):
        if self.checkpoint_dir is None:
            return
        from ttsx.train.checkpoint import save_checkpoint
        save_checkpoint(self.checkpoint_dir, tag, self.block_states,
                        self.state.global_step,
                        extra={"best_val": self.state.best_val,
                               "noise_scale": self.state.noise_scale,
                               "l1_weight": self.state.l1_weight})
        for cb in self.callbacks:
            cb.on_checkpoint(self, self.state.global_step)

    def restore_checkpoint(self, tag: str = "last") -> bool:
        if self.checkpoint_dir is None:
            return False
        from ttsx.train.checkpoint import restore_checkpoint
        restored = restore_checkpoint(self.checkpoint_dir, tag,
                                      self.block_states)
        if restored is None:
            return False
        self.block_states, step, extra = restored
        self.state.global_step = step
        self.state.best_val = extra.get("best_val", float("inf"))
        self.state.noise_scale = extra.get("noise_scale", 1.0)
        self.state.l1_weight = extra.get("l1_weight", 1.0)
        return True

    # -- run ----------------------------------------------------------------
    def train(self, max_steps: Optional[int] = None):
        cfg = self.cfg.train
        max_steps = max_steps or cfg.max_steps
        for cb in self.callbacks:
            cb.on_train_start(self)
        first = next(self.train_iter)
        if not self.block_states:
            self.init_states(first)
        batch = first
        while self.state.global_step < max_steps:
            metrics = self.train_step(batch)
            if (cfg.val_freq and
                    self.state.global_step % cfg.val_freq == 0):
                vm = self.validate()
                if vm.get("best"):
                    self.save_checkpoint("best")
            if (cfg.checkpoint_freq and
                    self.state.global_step % cfg.checkpoint_freq == 0):
                self.save_checkpoint("last")
            try:
                batch = next(self.train_iter)
            except StopIteration:
                break
        self.save_checkpoint("final")
        for cb in self.callbacks:
            cb.on_train_end(self)
        return self.state
