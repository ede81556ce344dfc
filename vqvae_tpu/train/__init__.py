from vqvae_tpu.train.state import TrainState, create_train_state  # noqa: F401
from vqvae_tpu.train.step import make_train_step  # noqa: F401
from vqvae_tpu.train.loop import train  # noqa: F401
