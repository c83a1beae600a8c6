from ttsx.nn.conv import Conv1d, ConvTranspose1d, avg_pool1d
from ttsx.nn.embed import FreqPosEmbed, sinusoidal_table, extend_to_length, rotary_mix
from ttsx.nn.s4 import S4, ssm_kernel, fft_dw_conv, scan_dw_conv
from ttsx.nn.attention import MHSA, SelfAttention1d
from ttsx.nn.conformer import ConformerLayer
from ttsx.nn.film import ResidualConvBlock, ScaleNorm, stochastic_depth
from ttsx.nn.vq import VectorQuantizer, HierVQ
from ttsx.nn.moe import GumbelMoE
from ttsx.nn.gst import GlobalStyleTokens
from ttsx.nn.pooling import StatsPooling, SelfAttentivePooling, MultiHeadAttentivePooling
from ttsx.nn.tf_block import TFBlock, HSFLayer, HarmonicSourceFilter
