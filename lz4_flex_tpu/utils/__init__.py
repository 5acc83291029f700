"""Shared utilities: checksums, buffer helpers."""

from .checksum import XxHash32, xxh32

__all__ = ["XxHash32", "xxh32"]
