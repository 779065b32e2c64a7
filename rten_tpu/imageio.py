"""Image IO: read/write + tensor conversion (rten-imageio/src/lib.rs:38).

`image_to_tensor` produces CHW f32 in [0, 1], matching the reference's
convention for model inputs.
"""

from __future__ import annotations

import numpy as np


def read_image(path) -> np.ndarray:
    """Load an image file -> CHW f32 [0,1]."""
    from PIL import Image

    with Image.open(path) as im:
        return image_to_tensor(np.asarray(im.convert("RGB")))


def image_to_tensor(hwc: np.ndarray) -> np.ndarray:
    """HWC uint8/float -> CHW f32 in [0,1]."""
    arr = np.asarray(hwc)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype == np.uint8:
        arr = arr.astype(np.float32) / 255.0
    return np.transpose(arr.astype(np.float32), (2, 0, 1))


def tensor_to_image(chw: np.ndarray) -> np.ndarray:
    """CHW f32 [0,1] -> HWC uint8."""
    arr = np.clip(np.asarray(chw), 0.0, 1.0)
    return (np.transpose(arr, (1, 2, 0)) * 255.0 + 0.5).astype(np.uint8)


def write_image(path, chw: np.ndarray) -> None:
    from PIL import Image

    hwc = tensor_to_image(chw)
    if hwc.shape[2] == 1:
        hwc = hwc[:, :, 0]
    Image.fromarray(hwc).save(path)
