from simplegaussiansplat_tk71_tpu.utils.knn import knn_mean_dist  # noqa: F401
from simplegaussiansplat_tk71_tpu.utils.metrics import psnr, ssim  # noqa: F401
