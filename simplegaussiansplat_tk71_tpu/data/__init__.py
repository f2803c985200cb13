from simplegaussiansplat_tk71_tpu.data.colmap import load_colmap_scene  # noqa: F401
from simplegaussiansplat_tk71_tpu.data.dataset import SceneDataset  # noqa: F401
