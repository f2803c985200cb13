from simplegaussiansplat_tk71_tpu.ops.sh import eval_sh  # noqa: F401
from simplegaussiansplat_tk71_tpu.ops import transforms  # noqa: F401
