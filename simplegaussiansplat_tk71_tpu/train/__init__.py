from simplegaussiansplat_tk71_tpu.train.config import TrainConfig  # noqa: F401
from simplegaussiansplat_tk71_tpu.train.trainer import Trainer  # noqa: F401
