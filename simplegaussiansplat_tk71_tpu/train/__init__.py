from simplegaussiansplat_tk71_tpu.train.config import TrainConfig  # noqa: F401
