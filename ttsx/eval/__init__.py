from ttsx.eval.metrics import (
    compute_eer, all_pairs_eer, mel_cepstral_distortion,
    diarization_error_rate, cluster_purity, silhouette_score)
from ttsx.eval.benchmarks import (
    time_fn, rtf, ci_latency_gate, time_budget_gate, CIGateError)
