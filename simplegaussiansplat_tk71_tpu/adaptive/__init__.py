from simplegaussiansplat_tk71_tpu.adaptive.densify import (  # noqa: F401
    DensifyStats,
    densify_and_prune,
    reset_opacity,
)
