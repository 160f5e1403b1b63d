from nans_clip_tpu.flywheel.build_dataset import build_texts_for_image

__all__ = ["build_texts_for_image"]
