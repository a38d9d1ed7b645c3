"""havc_tpu — TPU-native hybrid automatic video colorization framework.

A from-scratch JAX/XLA/Flax/Pallas rebuild of the capabilities of
dan64/vs-deoldify (HAVC): automatic + exemplar-based colorization of B&W
video.  See SURVEY.md at the repo root for the full component map of the
reference this framework mirrors.

Public API mirrors the reference's ``HAVC_*`` surface but operates on the
:class:`havc_tpu.clip.Clip` abstraction (batched device arrays + frame
metadata) instead of VapourSynth nodes.
"""

__version__ = "0.2.0"

from .api import *  # noqa: F401,F403
from .streaming import HAVC_main_streaming  # noqa: F401
from .utils import HAVC_LogMessage, HAVCError, MessageType  # noqa: F401
from .utils import enable_cache  # noqa: F401  (persistent XLA compile cache)
