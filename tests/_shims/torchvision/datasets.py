"""Stub: the reference imports torchvision.datasets at module scope but only
uses ImageFolder in the zero-shot path, which the parity tests don't run."""


class ImageFolder:  # pragma: no cover - referenced, never constructed
    def __init__(self, *a, **k):
        raise NotImplementedError(
            "torchvision shim: ImageFolder is not implemented")
