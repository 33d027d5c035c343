from .kernel import decode_image
from .png import decode_gray, encode_gray

__all__ = ["decode_image", "decode_gray", "encode_gray"]
