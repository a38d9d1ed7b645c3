"""Flax model engines: the five colorization model families of HAVC.

Each family is a pure inference graph (bf16/f32, NHWC) with a systematic
torch->flax weight converter in :mod:`havc_tpu.models.convert`.
"""
