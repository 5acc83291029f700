"""Flagship codec models: configured end-to-end compression pipelines."""

from .codec import CodecConfig, LZ4Codec

__all__ = ["CodecConfig", "LZ4Codec"]
