from simplegaussiansplat_tk71_tpu.parallel.mesh import make_mesh  # noqa: F401
from simplegaussiansplat_tk71_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_train_step,
)
