from ttsx.models.reference_encoder import ReferenceEncoder, Res2NetBlock, SERes2NetBlock
from ttsx.models.prosody import (
    ProsodyPredictor, EmotionClassifier, EmotionWeightLearner,
    pack_prosody, assign_emotion_tags, PROSODY_DIM, EMOTIONS)
from ttsx.models.acoustic import (
    AcousticModel, AcousticOutput, EmotionEncoder, VarianceAdaptor,
    UNetDiffusion, MelDiscriminator)
from ttsx.models.refiner import (
    ScoreSDERefiner, RefinerOutput, BetaScheduler, BandNet, sde_sample)
from ttsx.models.vocoder import (
    Generator, FiLMResidualBlock, MultiPeriodDiscriminator,
    MultiScaleDiscriminator, MultiBandDiscriminator, LearnableSTFT, STFTLoss)
from ttsx.models.pipeline import TTSPipeline, SynthesisOutput
