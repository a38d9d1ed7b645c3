"""Public HAVC_* API surface (grows as components land).

Mirrors the reference's vsdeoldify/__init__.py entry points; implemented on
the Clip abstraction.
"""

__all__: list = []
