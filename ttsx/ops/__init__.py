from ttsx.ops.mel_kernel import mel_frontend, mel_frontend_pallas
from ttsx.ops.s4_kernel import s4_scan, s4_scan_pallas
from ttsx.ops.upsample_kernel import upsample_lrelu_pallas
