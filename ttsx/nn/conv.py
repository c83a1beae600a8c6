"""1-D convolution helpers in the framework's canonical [B, T, C] layout.

Channels-last is the TPU-native layout (C rides the 128-lane dimension and
convs lower to MXU matmuls); the reference's torch code is [B, C, T]
throughout — we transpose the convention once, here, instead of per-call.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn


class Conv1d(nn.Module):
    """SAME/CAUSAL/VALID 1-D conv over [B, T, C]."""
    features: int
    kernel_size: int = 1
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: str = "SAME"  # SAME | CAUSAL | VALID
    use_bias: bool = True
    # zero-init the kernel (diffusion-UNet "zero module" pattern): the
    # layer outputs 0 at init but its kernel still receives full gradient,
    # so a residual branch behind it starts as identity without starving
    # upstream layers (unlike an output gate, whose zero value kills the
    # chain rule into everything before it)
    zero_init: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.padding
        if pad == "CAUSAL":
            left = (self.kernel_size - 1) * self.dilation
            pad = [(left, 0)]
        return nn.Conv(
            features=self.features,
            kernel_size=(self.kernel_size,),
            strides=(self.stride,),
            kernel_dilation=(self.dilation,),
            feature_group_count=self.groups,
            padding=pad,
            use_bias=self.use_bias,
            kernel_init=(nn.initializers.zeros if self.zero_init
                         else nn.initializers.lecun_normal()),
        )(x)


class ConvTranspose1d(nn.Module):
    """Strided transposed conv over [B, T, C]; upsamples T by `stride`.

    Matches the reference's ConvTranspose1d(k=2*stride, s=stride,
    p=stride//2) output-length contract: T_out = T * stride
    (vocoder7/generator.py:36-38, sde_refiner5/model.py:119).
    """
    features: int
    stride: int
    kernel_size: int | None = None  # default 2*stride
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size or 2 * self.stride
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=(k,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=self.use_bias,
        )(x)
        # VALID transpose conv yields T*stride + (k - stride); crop the
        # torch-equivalent `padding = stride // 2` from both ends.
        extra = y.shape[1] - x.shape[1] * self.stride
        lo = extra // 2
        return y[:, lo:lo + x.shape[1] * self.stride, :]


def avg_pool1d(x: jnp.ndarray, window: int, stride: int) -> jnp.ndarray:
    """[B, T, C] average pool along T (SAME padding)."""
    return nn.avg_pool(x, window_shape=(window,), strides=(stride,), padding="SAME")


def spectral_normalize(w: jnp.ndarray, n_iter: int = 8,
                       eps: float = 1e-8) -> jnp.ndarray:
    """Divide a conv/dense kernel by its largest singular value.

    TPU-native stateless variant of torch's nn.utils.spectral_norm
    (vocoder7/discriminators.py:22-31): instead of a persistent
    warm-started `u` vector (mutable state that would thread through every
    jitted GAN step), runs `n_iter` cold-start power iterations per call —
    pure, deterministic, and cheap (the reshaped matrix is at most
    [k*cin, cout]). Gradients flow through sigma with u/v stop-gradiented,
    matching torch SN semantics.
    """
    import jax
    mat = w.reshape(-1, w.shape[-1])                      # [k*cin, cout]
    u = jnp.full((mat.shape[0],), 1.0 / jnp.sqrt(mat.shape[0]), w.dtype)
    for _ in range(n_iter):
        v = mat.T @ u
        v = v / jnp.maximum(jnp.linalg.norm(v), eps)
        u = mat @ v
        u = u / jnp.maximum(jnp.linalg.norm(u), eps)
    u = jax.lax.stop_gradient(u)
    v = jax.lax.stop_gradient(v)
    sigma = u @ (mat @ v)
    return w / jnp.maximum(sigma, eps)


class SNConv(nn.Module):
    """Spectral-normalized N-D conv over channels-last input
    ([B, T, C] or [B, H, W, C]). kernel_size's length picks 1-D vs 2-D."""
    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: str = "SAME"
    n_power_iter: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax
        ks = tuple(self.kernel_size)
        strides = tuple(self.strides) if self.strides else (1,) * len(ks)
        cin = x.shape[-1]
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (*ks, cin, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        w = spectral_normalize(w, self.n_power_iter)
        if len(ks) == 1:
            dn = ("NWC", "WIO", "NWC")
        else:
            dn = ("NHWC", "HWIO", "NHWC")
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=strides, padding=self.padding,
            dimension_numbers=dn)
        return y + b


class _ConvTParams(nn.Module):
    """Param holder mirroring nn.ConvTranspose's tree (kernel, bias)."""
    kernel_size: int
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.kernel_size, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return w, b


class PallasUpsample(nn.Module):
    """ConvTranspose1d(stride=f) via the fused Pallas kernel on TPU
    (ttsx/ops/upsample_kernel.py). The param tree matches ConvTranspose1d
    (".../ConvTranspose_0/{kernel,bias}"), so checkpoints swap freely
    between the two implementations."""
    features: int
    stride: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w, b = _ConvTParams(2 * self.stride, x.shape[-1], self.features,
                            name="ConvTranspose_0")()
        import jax
        from ttsx.ops.upsample_kernel import upsample_lrelu_pallas
        interpret = jax.devices()[0].platform not in ("tpu", "axon")
        return upsample_lrelu_pallas(x, w, b, self.stride,
                                     interpret=interpret, lrelu=False)
