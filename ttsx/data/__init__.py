from ttsx.data.dataset import (
    TTSDataset, TTSDatasetConfig, PhonemeFrontend, TextEncoder,
    SpeakerBalancedSampler, load_file_list, read_wav, write_wav)
from ttsx.data.collate import (
    TTSCollator, CollatorConfig, AugmentationPipeline, add_noise,
    add_reverb, speed_perturb, spec_augment, mixup, bucket_length,
    load_noise_bank)
from ttsx.data.synthetic import synthetic_batch, synthetic_stream
from ttsx.data.refenc_dataset import RefEncDataset, ProsodyManifestDataset
from ttsx.data.adapters import collator_to_trainer_batch
from ttsx.data.prefetch import WavBatchLoader
