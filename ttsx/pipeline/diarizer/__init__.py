from ttsx.pipeline.diarizer.slicer import dynamic_slice, vad_probabilities
from ttsx.pipeline.diarizer.embedding import SliceEmbedder
from ttsx.pipeline.diarizer.cluster import (
    time_aware_sim, temporal_cluster, GreedyModularityClusterer,
    KMeansClusterer, ReIDMemory, ReIDCallback, PairCollector, WandBCallback)
from ttsx.pipeline.diarizer.overlap import detect_overlaps, spectral_flux
from ttsx.pipeline.diarizer.rebuilder import reconstruct_audio, write_rttm
from ttsx.pipeline.diarizer.controller import DiarizerController
from ttsx.pipeline.diarizer.reid import ReIDSystem
from ttsx.pipeline.diarizer.gnn import GNNClusterer
