"""Pure-jnp / Pallas kernel library: the TPU replacement for the reference's
VapourSynth C++ filters and PIL/NumPy/OpenCV per-frame pixel math."""

from . import chroma, colorspace, merge, resize  # noqa: F401
