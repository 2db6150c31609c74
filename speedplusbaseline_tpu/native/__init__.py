from .loader import native_available, decode_crop_resize, image_size

__all__ = ["native_available", "decode_crop_resize", "image_size"]
