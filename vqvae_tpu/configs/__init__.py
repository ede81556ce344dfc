from vqvae_tpu.configs.presets import (  # noqa: F401
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    PRESETS,
    get_config,
    load_config,
    save_config,
)
