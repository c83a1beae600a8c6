"""Per-stage train blocks: pluggable units the unified engine drives.

Mirrors the reference's TrainBlock interface (train/blocks/base.py:6-42):
each block owns its model, optimizer(s) and jitted step; the engine calls
`train_step(state, batch, rng)` and `val_step`. The vocoder block carries
four optimizers (G + MPD/MSD/MBD) — the JAX GAN dual-opt design SURVEY §7
flags as a hard part: discriminator and generator params live in separate
TrainStates and each step is a pure function.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ttsx.core.config import TTSXConfig
from ttsx.models.acoustic import AcousticModel
from ttsx.models.refiner import ScoreSDERefiner
from ttsx.models.vocoder import (
    Generator, MultiPeriodDiscriminator, MultiScaleDiscriminator,
    MultiBandDiscriminator, STFTLoss)
from ttsx.nn.gst import GlobalStyleTokens
from ttsx.train import losses as L
from ttsx.train.optim import make_optimizer
from ttsx.train.state import TrainState


class AcousticBlock:
    """Reference: train/blocks/acoustic.py (with the signature drift fixed)."""

    def __init__(self, cfg: TTSXConfig):
        self.cfg = cfg
        self.model = AcousticModel(cfg.acoustic)

    def init_state(self, rng: jax.Array, batch: Dict) -> TrainState:
        rng, init_rng = jax.random.split(rng)
        # jitted init: one compiled program, not an eager op storm
        params = jax.jit(lambda r: self.model.init(
            {"params": r, "diffusion": r, "dropout": r},
            batch["text_emb"], batch["prosody"], batch["emotion_probs"],
            target_mel=batch["mel"], speaker=batch.get("speaker"),
            deterministic=False))(init_rng)
        tx = make_optimizer(self.cfg.train.lr, self.cfg.train.warmup_steps,
                            self.cfg.train.max_steps,
                            self.cfg.train.weight_decay,
                            self.cfg.train.grad_clip)
        return TrainState.create(self.model.apply, params, tx, rng)

    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        state, rng = state.next_rng()
        c = self.cfg.acoustic

        def loss_fn(params):
            out = state.apply_fn(
                params, batch["text_emb"], batch["prosody"],
                batch["emotion_probs"], target_mel=batch["mel"],
                speaker=batch.get("speaker"), deterministic=False,
                rngs={"diffusion": rng, "dropout": rng})
            loss, parts = L.composite_acoustic_loss(
                out, batch["mel"], c.w_mel, c.w_mse, c.w_disc, c.w_diff,
                c.w_emo, mask=batch.get("frame_mask"))
            return loss, (parts, out.mel)

        (loss, (parts, mel)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        metrics = {"loss": loss, **parts}
        return state, {"metrics": metrics, "mel_pred": mel}

    @partial(jax.jit, static_argnums=(0,))
    def train_step_accum(self, state: TrainState, batches: Dict
                         ) -> Tuple[TrainState, Dict]:
        """Gradient accumulation over stacked micro-batches [A, ...] as a
        lax.scan — one optimizer step per accumulation window
        (train/engine/loop.py:72,84 grad_accum_steps)."""
        state, rng = state.next_rng()
        c = self.cfg.acoustic

        def loss_fn(params, mb):
            out = state.apply_fn(
                params, mb["text_emb"], mb["prosody"], mb["emotion_probs"],
                target_mel=mb["mel"], speaker=mb.get("speaker"),
                deterministic=False,
                rngs={"diffusion": rng, "dropout": rng})
            loss, _ = L.composite_acoustic_loss(
                out, mb["mel"], c.w_mel, c.w_mse, c.w_disc, c.w_diff,
                c.w_emo, mask=mb.get("frame_mask"))
            return loss, out.mel

        def micro(carry, mb):
            g_acc, l_acc = carry
            (loss, mel), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params, mb)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
            return (g_acc, l_acc + loss), mel

        zeros = jax.tree_util.tree_map(jnp.zeros_like, state.params)
        (grads, loss), mels = jax.lax.scan(micro, (zeros, 0.0), batches)
        n = jax.tree_util.tree_leaves(batches)[0].shape[0]  # static A
        grads = jax.tree_util.tree_map(lambda g: g / n, grads)
        state = state.apply_gradients(grads)
        return state, {"metrics": {"loss": loss / n},
                       "mel_pred": mels[-1]}

    @partial(jax.jit, static_argnums=(0,))
    def val_step(self, params, batch: Dict) -> Dict:
        out = self.model.apply(
            params, batch["text_emb"], batch["prosody"],
            batch["emotion_probs"], target_mel=batch["mel"],
            speaker=batch.get("speaker"), deterministic=True)
        l1 = jnp.mean(jnp.abs(out.mel - batch["mel"]))
        return {"val_l1": l1, "mel_pred": out.mel}


class RefinerBlock:
    """Reference: train/blocks/refiner.py + sde_refiner5/trainer.py.

    Implements the `novel: sde_noise_annealing` feature: `noise_scale`
    is a state field the engine anneals from validation L1
    (train/engine/loop.py:47 update_noise_schedule)."""

    def __init__(self, cfg: TTSXConfig):
        self.cfg = cfg
        self.model = ScoreSDERefiner(cfg.refiner)

    def init_state(self, rng: jax.Array, batch: Dict) -> TrainState:
        rng, init_rng = jax.random.split(rng)
        params = jax.jit(lambda r: self.model.init(
            r, batch["mel"], batch["prosody"], batch["style_id"],
            batch["text_emb"]))(init_rng)
        tx = make_optimizer(self.cfg.train.lr, self.cfg.train.warmup_steps,
                            self.cfg.train.max_steps,
                            self.cfg.train.weight_decay,
                            self.cfg.train.grad_clip)
        # the EMA codebook stats ("vq_stats" collection) are updated by
        # the forward pass, never by the optimizer — mask them off so
        # AdamW weight decay cannot corrupt them
        import optax
        mask = {k: jax.tree_util.tree_map(lambda _: k == "params", v)
                for k, v in params.items()}
        return TrainState.create(self.model.apply, params,
                                 optax.masked(tx, mask), rng)

    @partial(jax.jit, static_argnums=(0,))
    def train_step(self, state: TrainState, batch: Dict,
                   mel_pred: jnp.ndarray, noise_scale: jnp.ndarray,
                   l1_weight: jnp.ndarray) -> Tuple[TrainState, Dict]:
        state, rng = state.next_rng()
        t_rng, n_rng = jax.random.split(rng)
        B = mel_pred.shape[0]
        t = jax.random.uniform(t_rng, (B, 1), mel_pred.dtype)
        noise = jax.random.normal(n_rng, mel_pred.shape, mel_pred.dtype)
        # external noise injection (sde_refiner5/model.py:196-198 note)
        eps_injected = noise_scale * jnp.sqrt(t)[:, :, None] * noise
        noisy = mel_pred + eps_injected

        def loss_fn(params):
            # mutable vq_stats: the forward pass advances the EMA
            # codebooks (ttsx/nn/vq.py); the updated stats ride along as
            # aux output and replace the old ones after the grad step
            out, new_vars = state.apply_fn(
                params, noisy, batch["prosody"],
                batch["style_id"], batch["text_emb"], t=t,
                deterministic=False, mutable=["vq_stats"],
                rngs={"gumbel": rng, "dropout": rng})
            # score matching: train score -> -eps_injected so the sampler's
            # x += dt*score step (refiner.py sde_sample) moves toward clean
            # data; refiner_loss computes mean((score + eps)^2)
            loss, parts = L.refiner_loss(
                out.mel_ref, batch["mel"], out.vq_loss,
                l1_weight=l1_weight, sde_weight=1.0 - l1_weight,
                score=out.score, noise=eps_injected)
            return loss, (parts, new_vars)

        (loss, (parts, new_vars)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        state = state.apply_gradients(grads)
        state = state.replace(params={
            **state.params, "vq_stats": new_vars["vq_stats"]})
        return state, {"metrics": {"loss": loss, **parts}}

    @partial(jax.jit, static_argnums=(0,))
    def val_step(self, params, batch: Dict, mel_pred: jnp.ndarray) -> Dict:
        out = self.model.apply(params, mel_pred, batch["prosody"],
                               batch["style_id"], batch["text_emb"],
                               deterministic=True)
        return {"val_l1": jnp.mean(jnp.abs(out.mel_ref - batch["mel"])),
                "mel_ref": out.mel_ref}


import flax.struct


@flax.struct.dataclass
class VocoderStates:
    gen: TrainState
    gst: TrainState
    mpd: TrainState
    msd: TrainState
    mbd: TrainState
    stft: TrainState  # STFT-loss filterbanks — frozen at init, never stepped


class VocoderBlock:
    """Reference: train/blocks/vocoder.py + vocoder7/trainer.py:13-125.

    G+GST vs MPD/MSD/MBD adversarial training with EMA generator and the
    `novel: dynamic_gan` D:G ratio hook (engine-side)."""

    def __init__(self, cfg: TTSXConfig):
        self.cfg = cfg
        vc = cfg.vocoder
        self.gen = Generator(vc)
        self.gst = GlobalStyleTokens(vc.channels, vc.style_dim,
                                     vc.num_style_tokens)
        self.mpd = MultiPeriodDiscriminator(vc)
        self.msd = MultiScaleDiscriminator(vc)
        self.mbd = MultiBandDiscriminator(vc)
        self.stft_loss = STFTLoss(vc)

    def init_state(self, rng: jax.Array, batch: Dict) -> VocoderStates:
        vc = self.cfg.vocoder
        tr = self.cfg.train
        r = jax.random.split(rng, 7)
        mel = batch["mel"]
        wav = batch["wav"]
        style = jnp.zeros((mel.shape[0], vc.style_dim), mel.dtype)
        scale = batch.get("mel_scale") if vc.scale_cond else None
        gp = jax.jit(lambda k: self.gen.init(
            k, mel, batch["prosody"], style, batch["emotion_probs"],
            scale=scale))(r[0])
        gstp = jax.jit(lambda k: self.gst.init(k, mel))(r[1])
        mpdp = jax.jit(lambda k: self.mpd.init(k, wav))(r[2])
        msdp = jax.jit(lambda k: self.msd.init(k, wav))(r[3])
        mbdp = jax.jit(lambda k: self.mbd.init(k, wav))(r[4])
        stftp = jax.jit(lambda k: self.stft_loss.init(k, wav, wav))(r[5])
        mk = lambda apply_fn, p, ema=0.0: TrainState.create(
            apply_fn, p,
            make_optimizer(tr.lr, tr.warmup_steps, tr.max_steps,
                           tr.weight_decay, tr.grad_clip),
            r[6], ema_decay=ema)
        return VocoderStates(
            gen=mk(self.gen.apply, gp, ema=vc.ema_decay),
            gst=mk(self.gst.apply, gstp),
            mpd=mk(self.mpd.apply, mpdp),
            msd=mk(self.msd.apply, msdp),
            mbd=mk(self.mbd.apply, mbdp),
            stft=mk(self.stft_loss.apply, stftp))

    def _synthesize(self, gen_params, gst_params, batch, rng,
                    train: bool):
        """GST style + CFG-dropout synthesis (vocoder7/trainer.py:57-103)."""
        mel = batch["mel_ref"] if "mel_ref" in batch else batch["mel"]
        style = self.gst.apply(gst_params, mel)
        style_drop = emo_drop = False
        if train and rng is not None:
            p = self.cfg.vocoder.dropout_prob
            k1, k2 = jax.random.split(rng)
            # python-level CFG flags must be static under jit; emulate with
            # multiplicative masks instead
            style = style * (jax.random.bernoulli(k1, 1 - p, (style.shape[0], 1))
                             .astype(style.dtype))
            emo_mask = (jax.random.bernoulli(k2, 1 - p, (mel.shape[0], 1))
                        .astype(mel.dtype))
            emotion = batch["emotion_probs"] * emo_mask
        else:
            emotion = batch["emotion_probs"]
        vc = self.cfg.vocoder
        scale = batch.get("mel_scale") if vc.scale_cond else None
        return self.gen.apply(gen_params, mel, batch["prosody"], style,
                              emotion, scale=scale)

    @partial(jax.jit, static_argnums=(0,))
    def disc_step(self, states: VocoderStates, batch: Dict):
        gen_state, rng = states.gen.next_rng()
        states = states.replace(gen=gen_state)
        wav_fake = jax.lax.stop_gradient(self._synthesize(
            states.gen.params, states.gst.params, batch, rng, train=True))
        wav_real = batch["wav"]

        vc = self.cfg.vocoder
        # R1 gradient penalty on real wavs every r1_interval steps
        # (vocoder7/config.py r1_gamma/r1_interval; the reference leaves
        # the trainer hook unimplemented — losses.py docstring)
        apply_r1 = (states.mpd.step % vc.r1_interval) == 0

        def d_loss_fn(mpd_p, msd_p, mbd_p):
            rl1, _ = self.mpd.apply(mpd_p, wav_real)
            fl1, _ = self.mpd.apply(mpd_p, wav_fake)
            rl2, _ = self.msd.apply(msd_p, wav_real)
            fl2, _ = self.msd.apply(msd_p, wav_fake)
            rl3, _ = self.mbd.apply(mbd_p, wav_real)
            fl3, _ = self.mbd.apply(mbd_p, wav_fake)
            d = L.hinge_d_loss(rl1 + rl2 + rl3, fl1 + fl2 + fl3)

            def real_score(w):
                l1, _ = self.mpd.apply(mpd_p, w)
                l2, _ = self.msd.apply(msd_p, w)
                return sum(jnp.sum(l) for l in l1 + l2)

            r1 = jnp.mean(jnp.sum(
                jax.grad(real_score)(wav_real) ** 2, axis=(1, 2)))
            r1_term = jnp.where(apply_r1, 0.5 * vc.r1_gamma * r1, 0.0)
            return d + r1_term, (d, r1_term)

        (loss, (d_hinge, r1_term)), grads = jax.value_and_grad(
            d_loss_fn, argnums=(0, 1, 2), has_aux=True)(
            states.mpd.params, states.msd.params, states.mbd.params)
        states = states.replace(
            mpd=states.mpd.apply_gradients(grads[0]),
            msd=states.msd.apply_gradients(grads[1]),
            mbd=states.mbd.apply_gradients(grads[2]))
        # d_loss = the hinge term (the GAN-health band metric); the lazy
        # R1 penalty is reported separately so its every-16-step spikes
        # don't read as instability (vocoder7/config.py r1_interval)
        return states, {"d_loss": d_hinge, "r1": r1_term,
                        "d_total": loss}

    @partial(jax.jit, static_argnums=(0,))
    def gen_step(self, states: VocoderStates, batch: Dict):
        gen_state, rng = states.gen.next_rng()
        states = states.replace(gen=gen_state)
        wav_real = batch["wav"]
        vc = self.cfg.vocoder
        step = states.gen.step.astype(jnp.float32)

        def g_loss_fn(gen_p, gst_p):
            wav_fake = self._synthesize(gen_p, gst_p, batch, rng, train=True)
            fl1, ff1 = self.mpd.apply(states.mpd.params, wav_fake)
            _, rf1 = self.mpd.apply(states.mpd.params, wav_real)
            fl2, ff2 = self.msd.apply(states.msd.params, wav_fake)
            _, rf2 = self.msd.apply(states.msd.params, wav_real)
            fl3, ff3 = self.mbd.apply(states.mbd.params, wav_fake)
            _, rf3 = self.mbd.apply(states.mbd.params, wav_real)
            adv = L.hinge_g_loss(fl1 + fl2 + fl3)
            adv = adv * L.adversarial_warmup(step, vc.r1_interval)
            fm = L.feature_matching_loss(ff1 + ff2 + ff3, rf1 + rf2 + rf3)
            # STFT filterbank params are frozen at init (the reference never
            # optimizes them, vocoder7/trainer.py:26-30); descending them
            # with G drives the filterbank to zero and silently deletes the
            # spectral objective (ADVICE r1 high #2)
            stft = self.stft_loss.apply(states.stft.params, wav_fake,
                                        wav_real)
            g = adv + vc.lambda_fm * fm + stft
            parts = {"adv": adv, "fm": fm, "stft": stft}
            if vc.lambda_energy > 0.0:
                en = L.log_rms_energy_loss(wav_fake, wav_real)
                g = g + vc.lambda_energy * en
                parts["energy"] = en
            if "pitch_pred" in batch:
                p = jnp.mean(jnp.abs(batch["pitch_pred"] - batch["pitch"]))
                d = jnp.mean(jnp.abs(batch["duration_pred"]
                                     - batch["duration"]))
                g = g + vc.lambda_pitch * p + vc.lambda_dur * d
                parts.update({"pitch": p, "dur": d})
            return g, parts

        (loss, parts), grads = jax.value_and_grad(
            g_loss_fn, argnums=(0, 1), has_aux=True)(
            states.gen.params, states.gst.params)
        states = states.replace(
            gen=states.gen.apply_gradients(grads[0]),
            gst=states.gst.apply_gradients(grads[1]))
        return states, {"g_loss": loss, **parts}
