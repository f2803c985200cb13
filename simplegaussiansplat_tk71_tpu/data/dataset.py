"""Camera/image dataset and batch iteration.

Replaces the reference's GS_dataset + DataLoader usage (gs_model.py:13-30,
gs_control.py:158-178): numpy-side shuffled batches of (P, K, image) with
images loaded from <root>/images/<name> via PIL, plus the camera-extent
computation used as the densify scene extent.
"""

import os

import numpy as np


def camera_extent(P: np.ndarray) -> float:
    """Max distance from the mean camera translation (gs_model.py:23-30).

    Note: the reference uses the raw P[:, :, 3] translation column (camera-
    frame translation t = -R c), not camera centers; we match that behavior.
    """
    t = P[:, :, 3]
    mean = t.mean(axis=0)
    return float(np.linalg.norm(t - mean[None], axis=1).max())


def load_image(root_dir: str, name: str) -> np.ndarray:
    """(H, W, 3) float32 in [0, 1] from <root>/images/<name>
    (Image_to_transform, gs_load_colmap.py:7-23)."""
    from PIL import Image

    path = os.path.join(root_dir, "images", name)
    img = Image.open(path).convert("RGB")
    return np.asarray(img, np.float32) / 255.0


class SceneDataset:
    """Shuffled mini-batch iterator over a scene's cameras."""

    def __init__(self, scene, root_dir: str | None = None, images: np.ndarray | None = None):
        """scene: ColmapScene (or any object with P, K, wh, image_names).

        images: optional preloaded (M, H, W, 3) float32 stack; if None and
        root_dir given, images are loaded lazily per batch from disk.
        """
        self.scene = scene
        self.root_dir = root_dir
        self._images = images
        self.extent = camera_extent(scene.P)
        wh = np.asarray(scene.wh)
        # mixed per-camera sizes (reference: per-image W/H in the forward
        # loop, gs_load_colmap.py:114-115 / gs_model.py:402-451): pad every
        # image to the max size; static shapes stay intact and the loss
        # masks the padding via pixel_mask()
        self.wh = wh.astype(np.int32)
        self.mixed_sizes = not (wh == wh[0]).all()
        self.img_wh = (int(wh[:, 0].max()), int(wh[:, 1].max()))

    def __len__(self):
        return len(self.scene.P)

    def device_cache(self):
        """Stage the full image/P/K stacks in device memory once.

        ``batches`` then yields on-device GATHERS by batch index instead of
        uploading fresh host arrays every step — on the tunneled TPU each
        step's 3-camera image batch is ~3.8 MB of host->device transfer
        (~0.3 s at tunnel bandwidth), which dominated the r4 quality run's
        wall clock (device step ~0.03 s, wall ~0.38 s/step). The reference
        has the same per-step host->device copy (gs_control.py:174-178);
        a 100-camera 400x266 stack is ~120 MB of HBM, trivially resident.
        No-op for lazy-disk or mixed-size datasets. Returns self."""
        if isinstance(self._images, np.ndarray) and not self.mixed_sizes:
            import jax.numpy as jnp

            self._images_dev = jnp.asarray(self._images)
            self._P_dev = jnp.asarray(np.asarray(self.scene.P))
            self._K_dev = jnp.asarray(np.asarray(self.scene.K))
        return self

    _images_dev = None
    _P_dev = None
    _K_dev = None

    def get_images(self, idx) -> np.ndarray:
        if self._images_dev is not None:
            return self._images_dev[np.asarray(idx)]
        if isinstance(self._images, np.ndarray):
            return self._images[idx]
        W, H = self.img_wh
        out = np.zeros((len(idx), H, W, 3), np.float32)
        for row, i in enumerate(idx):
            # preloaded list (mixed sizes) or lazy disk load; pad to max
            if self._images is not None:
                img = np.asarray(self._images[i])
            else:
                img = load_image(self.root_dir, self.scene.image_names[i])
            out[row, : img.shape[0], : img.shape[1]] = img
        return out

    def pixel_mask(self, idx) -> np.ndarray | None:
        """(B, H, W) bool validity for a batch, or None when every camera
        shares one size (the loss then skips masking entirely)."""
        if not self.mixed_sizes:
            return None
        W, H = self.img_wh
        ys = np.arange(H)[None, :, None]
        xs = np.arange(W)[None, None, :]
        wh = self.wh[np.asarray(idx)]
        return (ys < wh[:, 1, None, None]) & (xs < wh[:, 0, None, None])

    def batches(self, batch_size: int, seed: int = 0, epochs: int | None = None):
        """Yield (P, K, images, indices) shuffled each epoch
        (DataLoader(shuffle=True), gs_control.py:160-166)."""
        rng = np.random.default_rng(seed)
        epoch = 0
        while epochs is None or epoch < epochs:
            order = rng.permutation(len(self))
            for s in range(0, len(order), batch_size):
                idx = order[s : s + batch_size]
                if len(idx) < batch_size:
                    # static shapes: wrap around instead of a ragged last batch
                    idx = np.concatenate([idx, order[: batch_size - len(idx)]])
                if self._P_dev is not None:
                    yield (self._P_dev[idx], self._K_dev[idx],
                           self.get_images(idx), idx)
                else:
                    yield (self.scene.P[idx], self.scene.K[idx],
                           self.get_images(idx), idx)
            epoch += 1
