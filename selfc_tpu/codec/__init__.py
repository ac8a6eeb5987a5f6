from .h265 import H265Stream, encode_decode_clip, ffmpeg_available  # noqa: F401
from .noise import add_noise  # noqa: F401
