from ttsx.train.state import TrainState
from ttsx.train.optim import warmup_cosine, adamw, make_optimizer
from ttsx.train.blocks import (
    AcousticBlock, RefinerBlock, VocoderBlock, VocoderStates)
from ttsx.train.engine import (
    UnifiedTrainer, Callback, BlockRegistry, TrainerState)
from ttsx.train.callbacks import (
    CSVLogger, JSONLLogger, StepTimeArtifact, TensorBoardLogger)
from ttsx.train import losses
