from simplegaussiansplat_tk71_tpu.models.gaussians import GaussianModel  # noqa: F401
