from ttsx.core.config import (
    AudioConfig,
    S4Config,
    RefEncConfig,
    ProsodyConfig,
    AcousticConfig,
    RefinerConfig,
    VocoderConfig,
    TrainConfig,
    MeshConfig,
    NovelConfig,
    TTSXConfig,
    load_config,
    save_config,
    to_dict,
    from_dict,
)
from ttsx.core.mesh import make_mesh, batch_sharding, replicated_sharding
