"""PIL-semantics twins of the torchvision transforms the reference uses
(clip/utils.py:179-186, eval/data.py): Compose, Resize((h, w), BICUBIC),
ToTensor, Normalize, InterpolationMode."""

import enum

import numpy as np
import torch
from PIL import Image


class InterpolationMode(enum.Enum):
    NEAREST = "nearest"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    LANCZOS = "lanczos"


_PIL_RESAMPLE = {
    InterpolationMode.NEAREST: Image.NEAREST,
    InterpolationMode.BILINEAR: Image.BILINEAR,
    InterpolationMode.BICUBIC: Image.BICUBIC,
    InterpolationMode.LANCZOS: Image.LANCZOS,
}


class Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class Resize:
    def __init__(self, size, interpolation=InterpolationMode.BILINEAR,
                 **_kw):
        self.size = size
        self.resample = _PIL_RESAMPLE[interpolation]

    def __call__(self, img: Image.Image) -> Image.Image:
        if isinstance(self.size, int):
            # torchvision int-size: shorter edge to size, keep aspect
            w, h = img.size
            if w <= h:
                nw, nh = self.size, max(1, round(self.size * h / w))
            else:
                nh, nw = self.size, max(1, round(self.size * w / h))
            return img.resize((nw, nh), self.resample)
        h, w = self.size
        return img.resize((w, h), self.resample)


class ToTensor:
    def __call__(self, img: Image.Image) -> torch.Tensor:
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        t = torch.from_numpy(arr.copy()).permute(2, 0, 1).contiguous()
        return t.to(torch.float32) / 255.0


class Normalize:
    def __init__(self, mean, std, inplace=False):
        self.mean = torch.tensor(mean, dtype=torch.float32).view(-1, 1, 1)
        self.std = torch.tensor(std, dtype=torch.float32).view(-1, 1, 1)

    def __call__(self, t: torch.Tensor) -> torch.Tensor:
        return (t - self.mean) / self.std


class CenterCrop:
    def __init__(self, size):
        self.size = (size, size) if isinstance(size, int) else size

    def __call__(self, img: Image.Image) -> Image.Image:
        h, w = self.size
        iw, ih = img.size
        left = (iw - w) // 2
        top = (ih - h) // 2
        return img.crop((left, top, left + w, top + h))
