from nans_clip_tpu.data.augment import preprocess_images
from nans_clip_tpu.data.dataset import (Batch, DataLoader, PairDataset,
                                        pad_len, preprocess_text)
from nans_clip_tpu.data.npack import (NPackReader, NPackWriter, decode_pair,
                                      encode_pair, get_native_lib)

__all__ = [
    "preprocess_images", "Batch", "DataLoader", "PairDataset", "pad_len",
    "preprocess_text", "NPackReader", "NPackWriter", "decode_pair",
    "encode_pair", "get_native_lib",
]
