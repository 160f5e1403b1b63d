def create_transform(*args, **kwargs):  # pragma: no cover
    raise NotImplementedError("timm shim: create_transform is not implemented")
