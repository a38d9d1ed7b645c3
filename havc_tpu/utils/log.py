"""Logging utilities mirroring the reference's HAVC_LogMessage surface.

The reference (vsslib/vsutils.py:25-48) routes messages through the
VapourSynth core logger with a ``MessageType`` enum whose EXCEPTION level
raises instead of logging.  Here the sink is the stdlib ``logging`` module
(logger name ``havc_tpu``) so host applications control routing; EXCEPTION
raises ``HAVCError`` (the ``vs.Error`` analog).
"""
from __future__ import annotations

import logging
from enum import IntEnum

__all__ = ["MessageType", "HAVCError", "HAVC_LogMessage", "get_logger"]

_logger = logging.getLogger("havc_tpu")


class HAVCError(RuntimeError):
    """Raised by HAVC_LogMessage(MessageType.EXCEPTION, ...) — the
    vs.Error analog (vsutils.py:44-45)."""


class MessageType(IntEnum):
    """Mirror of vsutils.MessageType (vsutils.py:25-31); values follow
    the VapourSynth MESSAGE_TYPE_* constants."""

    DEBUG = 0
    INFORMATION = 1
    WARNING = 2
    CRITICAL = 3
    FATAL = 4
    EXCEPTION = 10


_LEVELS = {
    MessageType.DEBUG: logging.DEBUG,
    MessageType.INFORMATION: logging.INFO,
    MessageType.WARNING: logging.WARNING,
    MessageType.CRITICAL: logging.CRITICAL,
    MessageType.FATAL: logging.CRITICAL,
}


def get_logger() -> logging.Logger:
    return _logger


def HAVC_LogMessage(
    message_type: MessageType = MessageType.INFORMATION, *args
) -> None:
    """Log (or raise, for EXCEPTION) a space-joined message
    (vsutils.HAVC_LogMessage:42-48)."""
    message_text = " ".join(map(str, args))
    if message_type == MessageType.EXCEPTION:
        raise HAVCError(message_text)
    _logger.log(_LEVELS.get(MessageType(message_type), logging.INFO),
                message_text)
