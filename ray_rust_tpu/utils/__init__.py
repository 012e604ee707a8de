from .modutil import fmod, imod, umod, fimod, rust_rem
from .image import save_png, encode_png, gradient_prefill
