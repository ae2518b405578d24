from .decoder import MotionDecoder, guided_forward  # noqa: F401
from .diffusion import AtomDiffusion  # noqa: F401
