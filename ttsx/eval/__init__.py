from ttsx.eval.metrics import (
    compute_eer, all_pairs_eer, mel_cepstral_distortion,
    diarization_error_rate, cluster_purity, silhouette_score)
from ttsx.eval.benchmarks import (
    time_fn, rtf, ci_latency_gate, time_budget_gate, CIGateError)
from ttsx.eval.acoustic_eval import (
    evaluate_acoustic, microbenchmarks, MOS_PLACEHOLDER)
from ttsx.eval.export import (
    export_stablehlo, load_stablehlo, aot_compile, export_reference_encoder)
