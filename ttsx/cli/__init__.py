"""Command-line entry points.

Mirrors the reference's console scripts (SURVEY §1 L7): refenc-train /
refenc-latency / refenc-eer (reference_encoder/setup.py entry_points),
hyperdiarizer (hyper_diarizer/setup.py), the observer main
(reference_encoder/main.py --job/--watch), plus unified training and
synthesis entry points the reference assembles ad hoc.
"""
from ttsx.cli.main import (
    main_observer, main_diarize, main_train, main_synth, main_refenc_eer,
    main_refenc_latency, main_bench, add_common_args)
